from kiji_mapreduce_spark.io.inputs import JobInput, job_input
from kiji_mapreduce_spark.io.outputs import JobOutput, job_output

__all__ = ["JobInput", "job_input", "JobOutput", "job_output"]
