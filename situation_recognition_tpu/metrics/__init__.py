from situation_recognition_tpu.metrics.scorer import ImsituScorer  # noqa: F401
