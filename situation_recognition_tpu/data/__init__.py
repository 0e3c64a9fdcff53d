from situation_recognition_tpu.data.encoder import ImsituEncoder  # noqa: F401
