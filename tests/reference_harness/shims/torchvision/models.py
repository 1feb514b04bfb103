"""Placeholder for ``import torchvision.models`` (lib/models/utils.py:6);
no symbol is used by the parity runs."""


def resnet50(*a, **k):
    raise NotImplementedError("torchvision.models shim: not needed by the parity harness")
