"""Public Suffix List (PSL) driven registered-domain extraction.

The registered (pay-level) domain is the per-site key crawl curation
groups on — per-domain document caps, domain mixtures, domain-level
quality stats. The heuristic expression in ``pipeline.text``
(last-two-labels + a small second-level table) mis-buckets hosts under
multi-label ccTLD registries outside its subset; this module implements
the full publicsuffix.org algorithm, driven by rule DATA instead of a
hard-coded expression, so the real (public-domain) PSL file can be
dropped in via ``load_psl(path)`` / ``kiji-mr crawl-ingest --psl``.

Algorithm (https://publicsuffix.org/list/ — public specification):

1. A rule matches a host when the rule's labels are a suffix of the
   host's labels; ``*`` matches exactly one label.
2. The prevailing rule is the matching exception rule (``!`` prefix) if
   any, else the matching rule with the most labels, else ``*``.
3. The public suffix is the prevailing rule's labels (for an exception
   rule, minus its leftmost label); the registered domain is the public
   suffix plus one more host label.

100 TB shape: rules are grouped by their number of CONCRETE trailing
labels ``j`` (a wildcard rule ``*.ck`` has one concrete label) and each
group becomes a tiny broadcast table joined against the host's last-j
labels — at most ``j_max`` (~4) broadcast hash joins, all map-side, no
shuffle, no explode, no UDF. The prevailing-rule selection is then a
pure Catalyst expression over the matched flags.

``PSL_SNAPSHOT`` vendors a curated subset of the list (the major ccTLD
second-level registries plus the canonical wildcard/exception entries);
it ships as data in the same format as the real file, so swapping in a
full snapshot is a file path, not a code change.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kiji_mapreduce_spark.functions import local_table

# A curated snapshot SUBSET of the Public Suffix List (the list itself
# is public-domain data, publicsuffix.org). Same file format as the
# real list: one rule per line, ``//`` comments, ``*`` wildcards, ``!``
# exceptions. Pass the full published file to load_psl()/--psl for
# production exactness; unlisted TLDs fall back to the implicit ``*``
# rule (last label is the public suffix), exactly per the spec.
PSL_SNAPSHOT = """\
// ---- ICANN section (subset) ----
// United Kingdom
co.uk
org.uk
me.uk
ltd.uk
plc.uk
net.uk
ac.uk
gov.uk
nhs.uk
police.uk
*.sch.uk
// Australia
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// Japan (incl. the geo wildcard + exception pairs)
co.jp
or.jp
ne.jp
ac.jp
ad.jp
ed.jp
go.jp
gr.jp
lg.jp
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// Brazil
com.br
net.br
org.br
gov.br
edu.br
mil.br
art.br
// China
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
// India
co.in
net.in
org.in
firm.in
gen.in
ind.in
ac.in
edu.in
gov.in
res.in
// South Africa
co.za
net.za
org.za
gov.za
ac.za
web.za
// New Zealand
co.nz
net.nz
org.nz
govt.nz
ac.nz
school.nz
geek.nz
gen.nz
maori.nz
// South Korea
co.kr
ne.kr
or.kr
re.kr
pe.kr
go.kr
ac.kr
hs.kr
ms.kr
es.kr
sc.kr
kg.kr
// Taiwan
com.tw
net.tw
org.tw
edu.tw
gov.tw
idv.tw
// Mexico
com.mx
net.mx
org.mx
edu.mx
gob.mx
// Argentina
com.ar
net.ar
org.ar
edu.ar
gob.ar
int.ar
mil.ar
tur.ar
// Turkey
com.tr
net.tr
org.tr
edu.tr
gov.tr
mil.tr
av.tr
dr.tr
// Singapore
com.sg
net.sg
org.sg
edu.sg
gov.sg
per.sg
// Hong Kong
com.hk
net.hk
org.hk
edu.hk
gov.hk
idv.hk
// Malaysia
com.my
net.my
org.my
edu.my
gov.my
mil.my
name.my
// Thailand
co.th
net.th
or.th
ac.th
go.th
in.th
mi.th
// Vietnam
com.vn
net.vn
org.vn
edu.vn
gov.vn
int.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
// Indonesia
co.id
net.id
or.id
ac.id
sch.id
go.id
mil.id
web.id
my.id
biz.id
// Israel
co.il
net.il
org.il
ac.il
gov.il
muni.il
idf.il
k12.il
// Poland
com.pl
net.pl
org.pl
edu.pl
gov.pl
mil.pl
info.pl
biz.pl
waw.pl
// Russia
com.ru
net.ru
org.ru
pp.ru
msk.ru
spb.ru
// Ukraine
com.ua
net.ua
org.ua
edu.ua
gov.ua
in.ua
// Egypt
com.eg
net.eg
org.eg
edu.eg
gov.eg
sci.eg
mil.eg
name.eg
// Saudi Arabia
com.sa
net.sa
org.sa
edu.sa
gov.sa
med.sa
pub.sa
sch.sa
// Kenya
co.ke
or.ke
ne.ke
go.ke
ac.ke
sc.ke
me.ke
info.ke
// Nigeria
com.ng
net.ng
org.ng
edu.ng
gov.ng
name.ng
sch.ng
// Colombia
com.co
net.co
org.co
edu.co
gov.co
mil.co
nom.co
// Chile
gov.cl
gob.cl
// Uruguay
com.uy
net.uy
org.uy
edu.uy
gub.uy
mil.uy
// Paraguay
com.py
net.py
org.py
edu.py
gov.py
mil.py
// Bolivia
com.bo
net.bo
org.bo
edu.bo
gob.bo
mil.bo
// Ecuador
com.ec
net.ec
org.ec
edu.ec
gob.ec
mil.ec
fin.ec
med.ec
pro.ec
// Guatemala
com.gt
net.gt
org.gt
edu.gt
gob.gt
mil.gt
ind.gt
// Peru
com.pe
net.pe
org.pe
edu.pe
gob.pe
mil.pe
nom.pe
// Venezuela
com.ve
net.ve
org.ve
edu.ve
gob.ve
mil.ve
web.ve
// full-wildcard TLDs (registry requires a second-level label)
*.bd
*.ck
!www.ck
*.er
*.fk
*.kh
*.mm
*.np
*.pg
// ---- PRIVATE section (subset): platform suffixes whose subdomains
// are independently-operated sites — exactly what per-domain caps and
// domain mixtures must NOT merge into one bucket ----
github.io
gitlab.io
blogspot.com
"""


@dataclass(frozen=True)
class PSLRules:
    """Parsed PSL rules grouped by concrete-trailing-label count ``j``.

    ``tables[j]`` maps a j-label suffix string to its
    ``(exact, exception, wildcard)`` flags, where ``wildcard`` means "a
    wildcard rule with j+1 labels whose concrete tail is this suffix".
    """

    tables: dict[int, dict[str, list[bool]]] = field(default_factory=dict)


def parse_psl(lines) -> PSLRules:
    """Parse PSL-format rule lines (strings or one big string) into
    the per-j lookup tables used by ``with_registered_domain``."""
    if isinstance(lines, str):
        lines = lines.splitlines()
    tables: dict[int, dict[str, list[bool]]] = {}

    def _slot(j: int, key: str) -> list[bool]:
        return tables.setdefault(j, {}).setdefault(key, [False, False,
                                                         False])

    for line in lines:
        rule = line.strip()
        if not rule or rule.startswith("//"):
            continue
        rule = rule.split()[0].lower()  # spec: stop at first whitespace
        if rule.startswith("!"):
            labels = rule[1:].split(".")
            if "*" in labels:
                raise ValueError(f"unsupported wildcard exception: {rule}")
            _slot(len(labels), ".".join(labels))[1] = True
        elif rule.startswith("*."):
            tail = rule[2:].split(".")
            if "*" in tail:
                raise ValueError(f"unsupported multi-wildcard rule: {rule}")
            # stored under the CONCRETE tail: j = rule labels - 1
            _slot(len(tail), ".".join(tail))[2] = True
        elif "*" in rule:
            raise ValueError(f"unsupported non-leading wildcard: {rule}")
        else:
            labels = rule.split(".")
            _slot(len(labels), ".".join(labels))[0] = True
    return PSLRules(tables)


def load_psl(path: str) -> PSLRules:
    """Load a PSL-format file (e.g. the published public_suffix_list.dat
    — public-domain data) for ``with_registered_domain`` / ``--psl``."""
    with open(path, encoding="utf-8") as f:
        return parse_psl(f.read())


def snapshot_rules() -> PSLRules:
    """The vendored snapshot subset, parsed."""
    return parse_psl(PSL_SNAPSHOT)


def _clean_host(host) -> Column:
    # strip ONE trailing dot: "example.com." is valid FQDN spelling and
    # would otherwise contribute an empty label, merging unrelated
    # sites into a "com." bucket (ADVICE r7)
    return F.regexp_replace(F.lower(host), r"\.$", "")


def with_registered_domain(df: DataFrame, host_col: str,
                           out_col: str = "registered_domain",
                           *, rules: PSLRules,
                           spark: SparkSession) -> DataFrame:
    """Add the PSL-exact registered domain of ``host_col`` as
    ``out_col`` via broadcast rule-table joins (see module docstring
    for the plan shape).

    Hosts that ARE a public suffix, single-label hosts, and dotted-quad
    IPs pass through whole — same fallback contract as the heuristic
    expression, so the two paths are drop-in interchangeable.
    """
    js = sorted(rules.tables)
    out = df.withColumn("_rd_h", _clean_host(F.col(host_col)))
    labels = F.split(F.col("_rd_h"), r"\.")
    n = F.size(labels)
    for j in js:
        tbl = local_table(
            spark,
            [(k, v[0], v[1], v[2]) for k, v in rules.tables[j].items()],
            f"_psl_tail_{j} string, _psl_ex_{j} boolean, "
            f"_psl_exc_{j} boolean, _psl_wd_{j} boolean")
        tail_j = F.when(
            n >= j, F.array_join(F.slice(labels, n - j + 1, j), "."))
        out = out.withColumn(f"_rd_tail_{j}", tail_j).join(
            F.broadcast(tbl),
            on=F.col(f"_rd_tail_{j}") == F.col(f"_psl_tail_{j}"),
            how="left")

    def _flag(j: int, which: str) -> Column:
        return F.coalesce(F.col(f"_psl_{which}_{j}"), F.lit(False))

    def _greatest(*cols: Column) -> Column:
        # F.greatest demands >= 2 args; with an EMPTY rule set (a
        # comments-only --psl file is legal — every TLD is implicit-*)
        # each candidate list collapses to its floor literal
        # (r8 review finding)
        return cols[0] if len(cols) == 1 else F.greatest(*cols)

    # longest matching exception rule (-> its label count), else 0
    exc_len = _greatest(
        F.lit(0), *[F.coalesce(F.when(_flag(j, "exc"), F.lit(j)),
                               F.lit(0)) for j in js])
    # longest normal match: exact rule with j labels -> j; wildcard
    # rule (j concrete tail labels, j+1 total) needs one host label for
    # the star -> j+1; implicit "*" default -> 1
    match_len = _greatest(
        F.lit(1),
        *[F.coalesce(F.when(_flag(j, "ex"), F.lit(j)), F.lit(0))
          for j in js],
        *[F.coalesce(F.when(_flag(j, "wd") & (n >= j + 1), F.lit(j + 1)),
                     F.lit(0)) for j in js])
    ps_len = F.when(exc_len > 0, exc_len - 1).otherwise(match_len)

    is_ip = F.col("_rd_h").rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    reg = (F.when(F.col("_rd_h").isNull(), F.lit(None).cast("string"))
           .when(is_ip, F.col("_rd_h"))
           .when(n > ps_len,
                 F.array_join(F.slice(labels, n - ps_len, ps_len + 1),
                              "."))
           .otherwise(F.col("_rd_h")))
    out = out.withColumn(out_col, reg)
    drop = (["_rd_h"]
            + [f"_rd_tail_{j}" for j in js]
            + [c for j in js for c in (
                f"_psl_tail_{j}", f"_psl_ex_{j}", f"_psl_exc_{j}",
                f"_psl_wd_{j}")])
    return out.drop(*drop)


def registered_domain_py(host: str, rules: PSLRules) -> str | None:
    """Single-node reference implementation of the same algorithm, for
    property tests: must agree with ``with_registered_domain`` on any
    host."""
    if host is None:
        return None
    h = host.lower()
    if h.endswith("."):
        h = h[:-1]
    import re as _re

    if _re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", h):
        return h
    labels = h.split(".")
    n = len(labels)
    exc_len = 0
    match_len = 1
    for j, table in rules.tables.items():
        if n < j:
            continue
        tail = ".".join(labels[n - j:])
        flags = table.get(tail)
        if not flags:
            continue
        if flags[1]:
            exc_len = max(exc_len, j)
        if flags[0]:
            match_len = max(match_len, j)
        if flags[2] and n >= j + 1:
            match_len = max(match_len, j + 1)
    ps_len = exc_len - 1 if exc_len else match_len
    if n > ps_len:
        return ".".join(labels[n - ps_len - 1:])
    return h
