"""torchvision shim for driving the live reference in this environment.

Only the surface the reference touches: ``transforms`` (Compose, Resize,
CenterCrop, ToTensor, Normalize, InterpolationMode — PIL-backend-exact,
see transforms.py), ``datasets.CIFAR10/CIFAR100`` (standard pickle
readers), and an empty ``models`` placeholder for the unused
``import torchvision.models`` in lib/models/utils.py:6.
"""

from . import datasets, models, transforms  # noqa: F401

__version__ = "0.0-lemon-shim"
