"""kernels/compact.py: stream compaction must reproduce the argsort
lane order (upsert_rounds' TPU path vs its CPU fallback; VERDICT r2
weak #6 wired the kernel into the scan's update compaction)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from faucet_tpu.core import scan as SC
from faucet_tpu.kernels.compact import mask_indices


@pytest.mark.parametrize("n,density", [(4096, 0.02), (4096, 0.0),
                                       (1 << 15, 0.5), (1 << 15, 1.0)])
def test_mask_indices_matches_argsort(n, density):
    rng = np.random.default_rng(int(n * (1 + density)))
    mask = rng.random(n) < density
    cap = 1024
    idx, cnt = mask_indices(jnp.asarray(mask), cap, interpret=True)
    idx, cnt = np.asarray(idx), int(cnt)
    assert cnt == int(mask.sum())
    want = np.nonzero(mask)[0][:cap]
    got = idx[: min(cnt, cap)]
    np.testing.assert_array_equal(got, want)


def test_upsert_rounds_kernel_path_matches_argsort(monkeypatch):
    """Force the Pallas branch (interpret mode) and check the folded
    result is bit-identical to the argsort fallback, including the
    multi-round carry when live lanes exceed K."""
    from faucet_tpu.core import bloom as BL
    from faucet_tpu.kernels import compact as CK

    rng = np.random.default_rng(3)
    n, K = 8192, 256
    mask = jnp.asarray(rng.random(n) < 0.12)  # ~1000 live -> 4 rounds
    pay = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int64)
                      .astype(np.int32))

    def fold(state, cm, ps):
        (vals,) = ps
        # order-sensitive fold so lane order differences would show
        upd = jnp.where(cm, vals, 0)
        return state * jnp.int32(31) + jnp.sum(upd, dtype=jnp.int32)

    ref, total_ref = SC.upsert_rounds(mask, K, (pay,), fold,
                                      jnp.zeros((), jnp.int32))

    monkeypatch.setenv("FAUCET_COMPACT", "kernel")
    monkeypatch.setattr(BL, "_use_pallas", lambda: True)
    real_mi = CK.mask_indices
    monkeypatch.setattr(
        CK, "mask_indices",
        lambda m, cap: real_mi(m, cap, interpret=True))
    got, total_got = SC.upsert_rounds(mask, K, (pay,), fold,
                                      jnp.zeros((), jnp.int32))
    assert int(total_ref) == int(total_got)
    assert int(ref) == int(got)
