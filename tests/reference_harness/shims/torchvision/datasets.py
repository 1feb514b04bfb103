"""CIFAR dataset readers over the standard python pickles (the format
torchvision.datasets.CIFAR10/100 consume). ``download=True`` is ignored —
the pickles must already exist under ``root`` (the harness writes
synthetic ones)."""

import pickle
from pathlib import Path

import numpy as np
from PIL import Image


class CIFAR10:
    base_folder = "cifar-10-batches-py"
    train_files = [f"data_batch_{i}" for i in range(1, 6)]
    test_files = ["test_batch"]
    label_key = b"labels"

    def __init__(self, root, train=True, download=False, transform=None, target_transform=None):
        self.transform = transform
        self.target_transform = target_transform
        folder = Path(root) / self.base_folder
        files = self.train_files if train else self.test_files
        data, targets = [], []
        for fname in files:
            path = folder / fname
            if not path.exists():
                raise FileNotFoundError(
                    f"{path} not found; the torchvision shim cannot download — "
                    "provide the standard CIFAR pickles"
                )
            with open(path, "rb") as f:
                entry = pickle.load(f, encoding="bytes")
            data.append(entry[b"data"])
            targets.extend(entry[self.label_key])
        self.data = np.vstack(data).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.targets = list(int(t) for t in targets)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        img = Image.fromarray(self.data[idx])
        target = self.targets[idx]
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class CIFAR100(CIFAR10):
    base_folder = "cifar-100-python"
    train_files = ["train"]
    test_files = ["test"]
    label_key = b"fine_labels"
