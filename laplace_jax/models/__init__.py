from laplace_jax.models.resnet import ResNet18, ResNet
from laplace_jax.models.mlp import MLP
from laplace_jax.models.lenet import LeNet
from laplace_jax.models.wideresnet import WideResNet16x4

__all__ = ["ResNet", "ResNet18", "MLP", "LeNet", "WideResNet16x4"]
