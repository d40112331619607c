"""Native relaxation kernel (native/relax.cpp) vs the numpy reference."""

import numpy as np
import pytest

from agdiff_tpu.data import native_relax
from agdiff_tpu.data.synthetic import _relax


def _problem(seed, n=20):
    rng = np.random.default_rng(seed)
    pos = rng.normal(scale=2.0, size=(n, 3))
    # a chain of bonds + a ring-like chord set
    constraints = [(i, i + 1, 1.5) for i in range(n - 1)]
    constraints += [(i, i + 2, 2.4) for i in range(0, n - 2, 3)]
    polish = constraints[: n - 1]
    exclude = np.zeros((n, n), bool)
    for i, j, _ in constraints:
        exclude[i, j] = exclude[j, i] = True
    return pos, constraints, exclude, polish


@pytest.mark.skipif(native_relax.get_lib() is None,
                    reason="no native toolchain")
def test_native_matches_numpy():
    pos, constraints, exclude, polish = _problem(0)
    a = _relax(pos.copy(), constraints, exclude, iters=40,
               polish=polish, use_native=False)
    b = native_relax.relax(pos.copy(), constraints, exclude, 40,
                           0.04, 1.5, polish)
    # same f64 math, same order except numpy's pairwise force summation;
    # the Gauss-Seidel projections are contractive so drift stays tiny
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.skipif(native_relax.get_lib() is None,
                    reason="no native toolchain")
def test_native_deterministic_and_satisfies_constraints():
    pos, constraints, exclude, polish = _problem(3)
    b1 = native_relax.relax(pos.copy(), constraints, exclude, 60,
                            0.04, 1.5, polish)
    b2 = native_relax.relax(pos.copy(), constraints, exclude, 60,
                            0.04, 1.5, polish)
    np.testing.assert_array_equal(b1, b2)
    for i, j, d in polish:
        ln = np.linalg.norm(b1[j] - b1[i])
        assert abs(ln - d) < 0.05, (i, j, ln, d)


def test_rich_generator_valid_with_and_without_native():
    """The rich generator's validity invariants hold on both paths (the
    two paths may differ bit-wise; each is deterministic)."""
    import agdiff_tpu.data.synthetic as syn
    from agdiff_tpu.data.synthetic import synthetic_dataset

    mols = synthetic_dataset(6, seed=4, chem="rich",
                             min_heavy=6, max_heavy=12)
    orig = syn._relax
    try:
        syn._relax = lambda *a, **k: orig(
            *a, **{**k, "use_native": False})
        mols_np = synthetic_dataset(6, seed=4, chem="rich",
                                    min_heavy=6, max_heavy=12)
    finally:
        syn._relax = orig
    for m in mols + mols_np:
        d = np.linalg.norm(m.pos[m.bond_index[0]] - m.pos[m.bond_index[1]],
                           axis=-1)
        assert d.min() > 0.8 and d.max() < 2.6
    for a, b in zip(mols, mols_np):
        np.testing.assert_array_equal(a.bond_type, b.bond_type)
