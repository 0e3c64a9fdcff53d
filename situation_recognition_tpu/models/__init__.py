from situation_recognition_tpu.models.resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152  # noqa: F401
from situation_recognition_tpu.models.fcggnn import FCGGNNHead  # noqa: F401
