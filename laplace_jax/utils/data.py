"""In-memory data loaders for the fit loops.

The reference consumes `torch.utils.data.DataLoader` (`laplace/baselaplace.py:904`);
the TPU-native equivalent keeps batches as device-ready numpy/jnp arrays and knows
its dataset size (`len(loader.dataset)` parity via `.n_data`). Batches are produced
host-side; all compute on them is jitted downstream, so the loader stays simple.

Dict-valued inputs (HF-style) are supported: pass `x` as a dict of arrays and set
`dict_key_x` / `dict_key_y` on the Laplace object, mirroring
`laplace/baselaplace.py:77-84`.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping, Sequence

import numpy as np


class ArrayLoader:
    """Batched iteration over in-memory arrays (or dicts of arrays).

    Parameters
    ----------
    x : array (N, ...) or Mapping[str, array]
    y : array (N, ...) or None (if x is a Mapping containing the labels)
    batch_size : int
    shuffle : bool, re-shuffles every epoch with a deterministic per-epoch seed
    seed : int
    """

    def __init__(self, x, y=None, batch_size: int = 128, shuffle: bool = False,
                 seed: int = 0):
        self.x = x
        self.y = y
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        if isinstance(x, Mapping):
            sizes = {k: len(v) for k, v in x.items()}
            self.n_data = next(iter(sizes.values()))
        else:
            self.n_data = len(x)

    def __len__(self) -> int:
        return (self.n_data + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        idx = np.arange(self.n_data)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
            self._epoch += 1
        for start in range(0, self.n_data, self.batch_size):
            sel = idx[start : start + self.batch_size]
            xb = self._take(self.x, sel)
            if self.y is None:
                yield xb
            else:
                yield xb, self.y[sel]

    @staticmethod
    def _take(x, sel):
        if isinstance(x, Mapping):
            return {k: v[sel] for k, v in x.items()}
        return x[sel]

    def subset(self, indices: np.ndarray) -> "ArrayLoader":
        """Loader over a fixed index subset (used for subset-of-data GP fits;
        reference `laplace/baselaplace.py:2409-2418`)."""
        x = self._take(self.x, indices)
        y = None if self.y is None else self.y[indices]
        sub = ArrayLoader(x, y, batch_size=self.batch_size, shuffle=False)
        return sub


def loader_batches(loader) -> Iterator[tuple[Any, Any]]:
    """Normalize loader iterates to (x, y) pairs, resolving dict-style batches
    downstream (the Laplace classes handle `dict_key_y` themselves)."""
    for data in loader:
        if isinstance(data, Sequence) and not isinstance(data, Mapping) and len(data) == 2:
            yield data[0], data[1]
        else:
            yield data, None


def dataset_size(loader) -> int:
    """`len(loader.dataset)` parity for generic loaders."""
    if hasattr(loader, "n_data"):
        return int(loader.n_data)
    if hasattr(loader, "dataset"):
        return len(loader.dataset)
    raise ValueError(
        "Loader must expose `.n_data` (ArrayLoader) or `.dataset` to determine N."
    )
