"""Synthetic lookup-index generation (power-law categorical features).

The numpy counterpart of the reference's ``utils/src/datagen.cpp`` /
``utils/include/datagen.h``:

* the same inverse-CDF transform ``y = (u*(max^g - min^g) + min^g)^(1/g)``
  with ``g = 1 - alpha`` (``datagen.cpp:39-50``),
* indices drawn from ``[1, num_categories]`` — 0 is reserved for "missing"
  (``datagen.h:89-96``),
* per-sample de-duplication: each sample's ``hotness`` indices are distinct
  (``datagen.cpp:87-104``),
* optional random category permutation (breaks the "small ids are hot"
  correlation) and per-sample shuffle (``datagen.cpp:64-74``).

A vectorized rejection loop replaces the reference's per-sample
``std::set`` loop; distribution parity is validated statistically
(see ``tests/test_datagen.py``, mirroring ``tests/test_datagen.cpp:109-139``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def translate_to_power_law(
    min_value: float, max_value: float, alpha: float, u: np.ndarray
) -> np.ndarray:
    """Map uniform [0,1) samples onto a power-law distribution.

    Same formula as the reference's ``translateToPowerLaw``
    (``datagen.cpp:39-50``); ``alpha == 0`` gives the uniform
    distribution. At ``alpha == 1`` the reference formula degenerates
    (gamma = 0); we use its analytic limit, the log-uniform distribution
    ``y = min * (max/min)**u``.
    """
    if alpha == 1.0:
        return min_value * (max_value / min_value) ** u
    gamma = 1.0 - alpha
    return (
        u * (max_value**gamma - min_value**gamma) + min_value**gamma
    ) ** (1.0 / gamma)


class PowerLawGenerator:
    """Vectorized power-law categorical feature generator.

    Produces ``[batch, hotness]`` index matrices with per-sample-distinct
    indices in ``[1, num_categories]``, smaller ids more frequent
    (for ``alpha > 0``; ``alpha == 0`` is uniform).
    """

    def __init__(
        self,
        num_categories: int,
        hotness: int,
        alpha: float = 0.0,
        *,
        shuffle: bool = False,
        permute: bool = False,
        seed: int = 0,
        dtype=np.int32,
    ):
        if num_categories <= 1:
            raise ValueError("need at least 2 categories (0 is reserved)")
        if hotness > num_categories:
            raise ValueError("hotness cannot exceed num_categories (de-dup)")
        self.num_categories = int(num_categories)
        self.hotness = int(hotness)
        self.alpha = float(alpha)
        self.shuffle = shuffle
        self.dtype = np.dtype(dtype)
        self._rng = np.random.default_rng(seed)
        self._permutation = None
        if permute:
            # Permute ids 0..num_categories; id 0 maps through like the
            # reference's permutation over num_categories+1 entries
            # (datagen.cpp:64-74).
            self._permutation = self._rng.permutation(self.num_categories + 1)

    @property
    def permutation(self):
        """The category permutation (or None), e.g. for feeding the
        native generator so both produce the same id space."""
        return self._permutation

    def _draw(self, n: int) -> np.ndarray:
        u = self._rng.random(n)
        if self.alpha == 0.0:
            # Uniform over [1, num_categories].
            y = 1 + np.floor(u * self.num_categories)
        else:
            y = np.floor(
                translate_to_power_law(
                    1.0, float(self.num_categories + 1), self.alpha, u
                )
            )
        y = np.clip(y, 1, self.num_categories)
        return y.astype(np.int64)

    def sample(self, batch: int) -> np.ndarray:
        """Return a ``[batch, hotness]`` matrix of per-sample-distinct indices.

        Sorted ascending per sample unless ``shuffle`` (the reference's
        ``std::set`` iteration returns sorted order, ``datagen.cpp:96-100``).

        De-duplication is a fully vectorized rejection loop: oversample each
        row, drop within-row duplicates, and redraw (with a larger
        oversampling factor) only the rows that still come up short.
        """
        h = self.hotness
        if h == 1:
            out = self._draw(batch).reshape(batch, 1)
        else:
            out = np.zeros((batch, h), dtype=np.int64)
            pending = np.arange(batch)
            k = max(2 * h, h + 8)
            while pending.size:
                cand = self._draw(pending.size * k).reshape(pending.size, k)
                # Mark duplicate *draws* (a value already drawn earlier in
                # the row). Selection must keep the first h distinct draws
                # in draw order — the distribution of the reference's
                # std::set insertion loop (datagen.cpp:87-104). Taking the
                # h smallest uniques instead would badly over-concentrate
                # the power law.
                order_v = np.argsort(cand, axis=1, kind="stable")
                sorted_c = np.take_along_axis(cand, order_v, axis=1)
                dup_sorted = np.concatenate(
                    [
                        np.zeros((pending.size, 1), bool),
                        sorted_c[:, 1:] == sorted_c[:, :-1],
                    ],
                    axis=1,
                )
                dup = np.zeros_like(dup_sorted)
                np.put_along_axis(dup, order_v, dup_sorted, axis=1)
                # Stable-partition first-occurrence draws to the front,
                # preserving draw order.
                order = np.argsort(dup, axis=1, kind="stable")
                cand = np.take_along_axis(cand, order, axis=1)
                n_unique = (~dup).sum(axis=1)
                done = n_unique >= h
                out[pending[done]] = cand[done, :h]
                pending = pending[~done]
                k = min(2 * k, 4 * self.num_categories)
        if self._permutation is not None:
            out = self._permutation[out]
        out.sort(axis=1)
        if self.shuffle:
            out = self._rng.permuted(out, axis=1)
        return out.astype(self.dtype)


def power_law_indices(
    num_categories: int,
    batch: int,
    hotness: int,
    alpha: float = 0.0,
    *,
    seed: int = 0,
    shuffle: bool = False,
    permute: bool = False,
    dtype=np.int32,
) -> np.ndarray:
    """One-shot convenience wrapper around :class:`PowerLawGenerator`."""
    gen = PowerLawGenerator(
        num_categories,
        hotness,
        alpha,
        shuffle=shuffle,
        permute=permute,
        seed=seed,
        dtype=dtype,
    )
    return gen.sample(batch)
