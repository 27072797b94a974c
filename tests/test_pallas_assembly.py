"""Pallas fused mask-assembly kernel: interpreter-mode parity vs jnp path.

(The same comparison runs compiled on real TPU — bit-exact, 17x faster —
but CI here is CPU-only, so the kernel runs under the Pallas interpreter.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dis_yolo_tpu.ops import mask_assembly as ma
from dis_yolo_tpu.ops.pallas_assembly import (assemble_masks_batch_pallas,
                                              assemble_masks_pallas)


@pytest.fixture(scope="module")
def case(rng=np.random.RandomState(7)):
    S, k, D = 64, 3, 12
    sm = jnp.asarray(rng.randn(S, S, k * k).astype(np.float32))
    b = rng.uniform(0, 1, (D, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]), np.maximum(b[:, 1], b[:, 3])],
                     axis=1)
    boxes[-2:] = 0.0   # padding rows
    return sm, jnp.asarray(boxes), k


def test_logits_bit_exact(case):
    sm, boxes, k = case
    want = np.asarray(ma.assemble_masks(sm, boxes, k))
    got = np.asarray(assemble_masks_pallas(sm, boxes, k, apply_sigmoid=False,
                                           interpret=True))
    np.testing.assert_array_equal(got, want)


def test_sigmoid_inside_box(case):
    sm, boxes, k = case
    logits = np.asarray(ma.assemble_masks(sm, boxes, k))
    got = np.asarray(assemble_masks_pallas(sm, boxes, k, apply_sigmoid=True,
                                           interpret=True))
    inside = logits != 0
    want = 1 / (1 + np.exp(-logits))
    np.testing.assert_allclose(got[inside], want[inside], rtol=1e-6, atol=1e-6)
    # outside the box the kernel writes exact zeros (jnp path writes
    # sigmoid(0)=0.5 there; both binarize to False downstream)
    assert (got[~inside] == 0).all()


def test_extract_operand_path_bit_exact(case):
    """use_extract routes the operand through the MXU one-hot extraction
    kernel (opt-in — measured slower than the transpose on TPU, see
    scripts/probe_operand_layout.py); bits must match either way."""
    sm, boxes, k = case
    want = np.asarray(ma.assemble_masks(sm, boxes, k))
    got = np.asarray(assemble_masks_pallas(sm, boxes, k, apply_sigmoid=False,
                                           interpret=True, use_extract=True))
    np.testing.assert_array_equal(got, want)


def test_batched(case):
    sm, boxes, k = case
    sms = jnp.stack([sm, sm * 2.0])
    bxs = jnp.stack([boxes, boxes])
    got = np.asarray(assemble_masks_batch_pallas(sms, bxs, k,
                                                 apply_sigmoid=False,
                                                 interpret=True))
    want0 = np.asarray(ma.assemble_masks(sm, boxes, k))
    np.testing.assert_array_equal(got[0], want0)
    np.testing.assert_array_equal(got[1], np.asarray(
        ma.assemble_masks(sm * 2.0, boxes, k)))


def test_tiled_layout_bit_exact(case):
    """force_tiled pins the spatially-tiled layout; same bits as jnp path."""
    sm, boxes, k = case
    want = np.asarray(ma.assemble_masks(sm, boxes, k))
    got = np.asarray(assemble_masks_pallas(sm, boxes, k, apply_sigmoid=False,
                                           interpret=True, force_tiled=True))
    np.testing.assert_array_equal(got, want)
    logits = want
    got_sig = np.asarray(assemble_masks_pallas(sm, boxes, k,
                                               apply_sigmoid=True,
                                               interpret=True,
                                               force_tiled=True))
    inside = logits != 0
    np.testing.assert_allclose(got_sig[inside], 1 / (1 + np.exp(-logits[inside])),
                               rtol=1e-6, atol=1e-6)
    assert (got_sig[~inside] == 0).all()


def test_stride1_576_picks_tiled_and_matches(rng=np.random.RandomState(11)):
    """S=576 (stride-1 decoder) exceeds the resident VMEM budget; the tiled
    layout must engage automatically and still bit-match the jnp gather."""
    from dis_yolo_tpu.ops.pallas_assembly import fits_vmem
    S, k, D = 576, 3, 6
    assert not fits_vmem(S, k)
    sm = jnp.asarray(rng.randn(S, S, k * k).astype(np.float32))
    b = rng.uniform(0, 1, (D, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]), np.maximum(b[:, 1], b[:, 3])],
                     axis=1)
    boxes[-1] = 0.0
    boxes = jnp.asarray(boxes)
    want = np.asarray(ma.assemble_masks(sm, boxes, k))
    got = np.asarray(assemble_masks_pallas(sm, boxes, k, apply_sigmoid=False,
                                           interpret=True))
    np.testing.assert_array_equal(got, want)


def test_tiled_bwd_grad_parity_576(rng=np.random.RandomState(13)):
    """Tiled custom-VJP backward at S=576 bit-matches jnp autodiff."""
    import jax
    from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_trainable
    S, k, R = 576, 3, 4
    sm = jnp.asarray(rng.randn(S, S, k * k).astype(np.float32))
    b = rng.uniform(0, 1, (R, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]), np.maximum(b[:, 1], b[:, 3])],
                     axis=1)
    bpx = jnp.round(jnp.asarray(boxes) * S)
    want_f = np.asarray(jax.vmap(lambda bb: ma.assemble_mask_single(sm, bb, k))(bpx))
    got_f = np.asarray(assemble_masks_trainable(sm, bpx, k, True))
    np.testing.assert_array_equal(got_f, want_f)

    w = jnp.asarray(rng.randn(R, S, S).astype(np.float32))
    g_want = np.asarray(jax.grad(
        lambda x: jnp.sum(jax.vmap(
            lambda bb: ma.assemble_mask_single(x, bb, k))(bpx) * w))(sm))
    g_got = np.asarray(jax.grad(
        lambda x: jnp.sum(assemble_masks_trainable(x, bpx, k, True) * w))(sm))
    np.testing.assert_array_equal(g_got, g_want)


@pytest.mark.parametrize("k", [5, 7])
@pytest.mark.parametrize("force_tiled", [False, True])
def test_k_variant_parity(k, force_tiled, rng=np.random.RandomState(17)):
    """The reference's commented k=5/7 assembly variants
    (yolo3_net_pos.py:814-823,:898-907) through the Pallas fast path,
    both kernel layouts: bit-parity vs the jnp gather."""
    S, D = 64, 6
    sm = jnp.asarray(rng.randn(S, S, k * k).astype(np.float32))
    b = rng.uniform(0, 1, (D, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]), np.maximum(b[:, 1], b[:, 3])],
                     axis=1)
    boxes[-1] = 0.0
    boxes = jnp.asarray(boxes)
    want = np.asarray(ma.assemble_masks(sm, boxes, k))
    got = np.asarray(assemble_masks_pallas(sm, boxes, k, apply_sigmoid=False,
                                           interpret=True,
                                           force_tiled=force_tiled))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", [5, 7])
def test_k_variant_trainable_grad_parity(k, rng=np.random.RandomState(19)):
    """Custom-VJP backward kernel at k=5/7: gradient bit-matches jnp
    autodiff (matches test_k_variant_parity's forward coverage)."""
    import jax
    from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_trainable
    S, R = 64, 4
    sm = jnp.asarray(rng.randn(S, S, k * k).astype(np.float32))
    b = rng.uniform(0, 1, (R, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]), np.maximum(b[:, 1], b[:, 3])],
                     axis=1)
    bpx = jnp.round(jnp.asarray(boxes) * S)
    got_f = np.asarray(assemble_masks_trainable(sm, bpx, k, True))
    want_f = np.asarray(jax.vmap(
        lambda bb: ma.assemble_mask_single(sm, bb, k))(bpx))
    np.testing.assert_array_equal(got_f, want_f)
    w = jnp.asarray(rng.randn(R, S, S).astype(np.float32))
    g_want = np.asarray(jax.grad(
        lambda x: jnp.sum(jax.vmap(
            lambda bb: ma.assemble_mask_single(x, bb, k))(bpx) * w))(sm))
    g_got = np.asarray(jax.grad(
        lambda x: jnp.sum(assemble_masks_trainable(x, bpx, k, True) * w))(sm))
    np.testing.assert_array_equal(g_got, g_want)


def test_trainable_fwd_and_grad_parity(case):
    """Custom-VJP kernel: forward and d/d(scoremap) bit-match the jnp path."""
    import jax
    from dis_yolo_tpu.ops.pallas_assembly import assemble_masks_trainable
    sm, boxes, k = case
    s = sm.shape[0]
    bpx = jnp.round(boxes * s)
    want_f = np.asarray(jax.vmap(lambda b: ma.assemble_mask_single(sm, b, k))(bpx))
    got_f = np.asarray(assemble_masks_trainable(sm, bpx, k, True))
    np.testing.assert_array_equal(got_f, want_f)

    w = jnp.asarray(np.random.RandomState(3).randn(*want_f.shape).astype(np.float32))
    g_want = np.asarray(jax.grad(
        lambda x: jnp.sum(jax.vmap(
            lambda b: ma.assemble_mask_single(x, b, k))(bpx) * w))(sm))
    g_got = np.asarray(jax.grad(
        lambda x: jnp.sum(assemble_masks_trainable(x, bpx, k, True) * w))(sm))
    np.testing.assert_array_equal(g_got, g_want)
    # boxes receive zero gradient (round kills it in the jnp path too)
    gb = jax.grad(lambda b: jnp.sum(assemble_masks_trainable(sm, b, k, True)),
                  argnums=0)
    assert np.asarray(jax.grad(
        lambda b: jnp.sum(assemble_masks_trainable(sm, b, k, True)))(bpx)).max() == 0
