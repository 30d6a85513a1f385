from distributed_mapreduce_in_docker_rpyc_spark.streaming import jobs  # noqa: F401
