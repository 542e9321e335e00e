"""Running metrics used for validation/gridsearch.

TPU-native counterpart of the reference's torchmetrics usage: `RunningNLLMetric`
(`laplace/utils/metrics.py:6-43`) with `ignore_index` for LLM label padding, and a
running MSE matching torchmetrics `MeanSquaredError` semantics used in
`laplace/baselaplace.py:492-499`.
"""

from __future__ import annotations

import jax.numpy as jnp


class RunningNLLMetric:
    """Accumulates NLL of predicted class probabilities, ignoring `ignore_index`."""

    def __init__(self, ignore_index: int = -100):
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self.nll_sum = 0.0
        self.n_valid = 0

    def update(self, probs: jnp.ndarray, targets: jnp.ndarray) -> None:
        probs = probs.reshape(-1, probs.shape[-1])
        targets = targets.reshape(-1)
        valid = targets != self.ignore_index
        safe_targets = jnp.where(valid, targets, 0)
        logp = jnp.log(probs)[jnp.arange(targets.shape[0]), safe_targets]
        self.nll_sum += float(jnp.sum(jnp.where(valid, -logp, 0.0)))
        self.n_valid += int(jnp.sum(valid))

    def compute(self) -> float:
        return self.nll_sum / max(self.n_valid, 1)


class RunningMSEMetric:
    """Running mean squared error, summed over output dims like torchmetrics'
    `MeanSquaredError(num_outputs=C).compute().sum()`."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.sq_sum = 0.0
        self.n = 0

    def update(self, mean: jnp.ndarray, targets: jnp.ndarray) -> None:
        self.sq_sum += float(jnp.sum((mean - targets) ** 2))
        self.n += int(mean.shape[0])

    def compute(self) -> float:
        return self.sq_sum / max(self.n, 1)


def expected_calibration_error(
    probs: jnp.ndarray, targets: jnp.ndarray, n_bins: int = 15
) -> float:
    """Standard binned ECE over max-probability confidence (the metric the
    reference's calibration examples report, `docs/calibration_example.md`)."""
    import numpy as np

    probs = np.asarray(probs)
    targets = np.asarray(targets)
    conf = probs.max(-1)
    pred = probs.argmax(-1)
    acc = (pred == targets).astype(np.float64)
    bins = np.linspace(0.0, 1.0, n_bins + 1)
    ece = 0.0
    for lo, hi in zip(bins[:-1], bins[1:]):
        sel = (conf > lo) & (conf <= hi)
        if sel.sum() == 0:
            continue
        ece += sel.mean() * abs(acc[sel].mean() - conf[sel].mean())
    return float(ece)


def get_nll(out_dist: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean NLL of class-probability predictions (reference `utils/utils.py:35-36`)."""
    logp = jnp.log(out_dist)[jnp.arange(targets.shape[0]), targets]
    return -jnp.mean(logp)
