from distributed_mapreduce_in_docker_rpyc_spark.core.mapreduce import run_mapreduce

__all__ = ["run_mapreduce"]
