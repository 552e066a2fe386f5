"""Statistical datagen tests, mirroring ``tests/test_datagen.cpp:109-160``:

* one-hot histogram vs the analytic power-law integral, tolerance 1e-3,
* multi-hot draws have no within-sample repetition and stay in range.
"""

import numpy as np

from cuembed_tpu.utils import PowerLawGenerator


def _analytic_bin_mass(edges, alpha, lo, hi):
    """Mass of each [edges[i], edges[i+1]) bin under pdf ~ x^-alpha on [lo, hi)."""
    g = 1.0 - alpha

    def cdf(x):
        return (x**g - lo**g) / (hi**g - lo**g)

    return np.diff([cdf(e) for e in edges])


def test_one_hot_power_law_histogram():
    num_categories = 1000
    alpha = 1.15
    n = 4_000_000
    gen = PowerLawGenerator(num_categories, 1, alpha, seed=42)
    draws = gen.sample(n).reshape(-1).astype(np.float64)
    assert draws.min() >= 1 and draws.max() <= num_categories

    edges = np.unique(np.logspace(0, np.log10(num_categories + 1), 24).astype(int))
    hist, _ = np.histogram(draws, bins=edges)
    expected = _analytic_bin_mass(edges, alpha, 1.0, float(num_categories + 1))
    got = hist / n
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_one_hot_uniform():
    num_categories = 100
    gen = PowerLawGenerator(num_categories, 1, 0.0, seed=3)
    draws = gen.sample(200_000).reshape(-1)
    hist = np.bincount(draws, minlength=num_categories + 1)
    assert hist[0] == 0  # id 0 reserved
    np.testing.assert_allclose(
        hist[1:] / draws.size, np.full(num_categories, 1 / num_categories), atol=2e-3
    )


def test_multi_hot_no_repetition_and_range():
    gen = PowerLawGenerator(200, 48, 1.05, seed=11)
    idx = gen.sample(500)
    assert idx.shape == (500, 48)
    assert idx.min() >= 1 and idx.max() <= 200
    for row in idx:
        assert np.unique(row).size == row.size


def test_multi_hot_marginal_distribution_unbiased():
    """Multi-hot selection must keep the first h *distinct draws* (the
    reference's std::set insertion, ``datagen.cpp:87-104``), not the h
    smallest candidates — the latter over-concentrates the power law.

    Oracle: a direct simulation of the reference's draw-until-h-distinct
    loop using the same inverse-CDF transform. Marginal tail masses must
    agree within sampling noise.
    """
    from cuembed_tpu.utils.datagen import translate_to_power_law

    num_categories, h, alpha = 100_000, 8, 1.15
    gen = PowerLawGenerator(num_categories, h, alpha, seed=123)
    draws = gen.sample(20_000).reshape(-1).astype(np.float64)

    rng = np.random.default_rng(321)
    sim = []
    for _ in range(5_000):
        seen = set()
        while len(seen) < h:
            y = int(
                np.floor(
                    translate_to_power_law(
                        1.0, float(num_categories + 1), alpha, rng.random()
                    )
                )
            )
            seen.add(min(max(y, 1), num_categories))
        sim.extend(seen)
    sim = np.asarray(sim, np.float64)

    for q in (10.0, 100.0, 1000.0, 10_000.0):
        got = np.mean(draws < q)
        want = np.mean(sim < q)
        assert abs(got - want) < 0.015, (q, got, want)


def test_permute_and_shuffle():
    base = PowerLawGenerator(1000, 8, 1.15, seed=5).sample(2000)
    perm = PowerLawGenerator(1000, 8, 1.15, seed=5, permute=True).sample(2000)
    # Permutation breaks the "small ids are hot" skew: mean id rises.
    assert perm.mean() > base.mean() * 2
    shuf = PowerLawGenerator(1000, 8, 1.15, seed=5, shuffle=True).sample(2000)
    rows_sorted = np.sort(shuf, axis=1)
    assert not np.array_equal(shuf, rows_sorted)  # some rows out of order
    for row in shuf:
        assert np.unique(row).size == row.size


def test_determinism():
    a = PowerLawGenerator(500, 16, 1.05, seed=9).sample(100)
    b = PowerLawGenerator(500, 16, 1.05, seed=9).sample(100)
    np.testing.assert_array_equal(a, b)


def test_alpha_one_log_uniform_limit():
    """alpha=1 uses the analytic log-uniform limit (the raw reference
    formula degenerates at gamma=0 and would hang the de-dup loop)."""
    gen = PowerLawGenerator(10_000, 8, 1.0, seed=1)
    out = gen.sample(2000)
    assert out.min() >= 1 and out.max() <= 10_000
    flat = out.reshape(-1).astype(np.float64)
    # log-uniform: P(y < sqrt(max)) ~ 0.5
    got = np.mean(flat < 100.0)
    assert 0.40 < got < 0.60, got
