from adaptiveisp_tpu.serve.rest import DetectionServer, serve  # noqa: F401
