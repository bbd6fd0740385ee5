"""UniGR composite: train forward losses + evaluate step (tiny configs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rga3_tpu.config import SegHeadConfig
from rga3_tpu.models.qwen25vl import tiny_config
from rga3_tpu.models.sam2 import tiny_sam2_config
from rga3_tpu.models.unigr import UniGR, UniGRConfig

SEG_ID = 151998


@pytest.fixture(scope="module")
def unigr():
    qcfg = tiny_config(vocab_size=152_000)
    scfg = tiny_sam2_config(image_size=64)
    cfg = UniGRConfig(
        qwen=qcfg,
        sam2=scfg.replace(d_model=32),
        seg=SegHeadConfig(out_dim=32, seg_token_id=SEG_ID,
                          ce_loss_weight=1.0, bce_loss_weight=2.0,
                          dice_loss_weight=0.5),
    )
    model = UniGR(cfg)
    rng = np.random.default_rng(0)
    B, L, T = 2, 10, 2
    ids = rng.integers(0, 1000, size=(B, L)).astype(np.int32)
    ids[:, 6] = SEG_ID
    images = jnp.asarray(
        rng.normal(size=(T, 64, 64, 3)).astype(np.float32)
    )
    lang = jnp.asarray(rng.normal(size=(T, 1, 32)).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), images, lang, jnp.asarray(ids)
    )
    return cfg, model, params, ids


@pytest.mark.slow
def test_train_forward_losses(unigr):
    cfg, model, params, ids = unigr
    rng = np.random.default_rng(1)
    B, L, T = 2, 10, 2
    labels = ids.copy()
    labels[:, :4] = -100
    pos = np.broadcast_to(np.arange(L)[None, None], (3, B, L)).copy()
    images_sam = jnp.asarray(
        rng.normal(size=(B, T, 64, 64, 3)).astype(np.float32)
    )
    gt = jnp.asarray((rng.random((B, T, 48, 56)) > 0.5).astype(np.float32))
    out = model.apply(
        params,
        jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(pos), None,
        images_sam, gt, jnp.ones((B,)),
        compute_dtype=jnp.float32,
        method=UniGR.train_forward,
    )
    for k in ["loss", "ce_loss", "mask_bce_loss", "mask_dice_loss"]:
        assert np.isfinite(float(out[k])), k
    assert float(out["loss"]) > 0


@pytest.mark.slow
def test_train_forward_no_seg_sample_zero_mask_loss(unigr):
    cfg, model, params, ids = unigr
    rng = np.random.default_rng(2)
    B, L, T = 2, 10, 2
    ids2 = ids.copy()
    ids2[:, 6] = 5  # remove [SEG] everywhere
    labels = ids2.copy()
    pos = np.broadcast_to(np.arange(L)[None, None], (3, B, L)).copy()
    images_sam = jnp.asarray(
        rng.normal(size=(B, T, 64, 64, 3)).astype(np.float32)
    )
    gt = jnp.asarray((rng.random((B, T, 32, 32)) > 0.5).astype(np.float32))
    out = model.apply(
        params,
        jnp.asarray(ids2), jnp.asarray(labels), jnp.asarray(pos), None,
        images_sam, gt, jnp.ones((B,)),
        compute_dtype=jnp.float32,
        method=UniGR.train_forward,
    )
    assert abs(float(out["mask_loss"])) < 1e-6


@pytest.mark.slow
def test_train_forward_is_differentiable(unigr):
    cfg, model, params, ids = unigr
    rng = np.random.default_rng(3)
    B, L, T = 2, 10, 2
    labels = ids.copy()
    pos = np.broadcast_to(np.arange(L)[None, None], (3, B, L)).copy()
    images_sam = jnp.asarray(
        rng.normal(size=(B, T, 64, 64, 3)).astype(np.float32)
    )
    gt = jnp.asarray((rng.random((B, T, 32, 32)) > 0.5).astype(np.float32))

    def loss_fn(p):
        return model.apply(
            p, jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(pos),
            None, images_sam, gt, jnp.ones((B,)),
            compute_dtype=jnp.float32, method=UniGR.train_forward,
        )["loss"]

    grads = jax.grad(loss_fn)(params)
    g = grads["params"]["text_hidden_fcs"]["fc2"]["kernel"]
    assert float(jnp.abs(g).max()) > 0  # seg head receives gradient


@pytest.mark.slow
def test_evaluate_step(unigr):
    cfg, model, params, ids = unigr
    rng = np.random.default_rng(4)
    L, T = 10, 3
    pos = np.broadcast_to(np.arange(L)[None, None], (3, 1, L)).copy()
    frames = jnp.asarray(
        rng.normal(size=(T, 64, 64, 3)).astype(np.float32)
    )
    out = model.apply(
        params, jnp.asarray(ids[:1]), jnp.asarray(pos), frames,
        compute_dtype=jnp.float32, method=UniGR.evaluate_step,
    )
    assert out["high_res_masks"].shape == (T, 1, 64, 64)
    assert bool(out["has_seg"][0])


@pytest.mark.slow
def test_frozen_backbone_stop_gradient(unigr):
    """freeze_sam_backbone must (a) zero the image-encoder gradient (the
    backward pass XLA then never builds at scale), (b) leave every
    trainable-pattern gradient bit-identical — the cut sits strictly above
    conv_s0/s1 + mask decoder + the language path."""
    from rga3_tpu.train.optimizer import trainable_mask

    cfg, model, params, ids = unigr
    rng = np.random.default_rng(5)
    B, L, T = 2, 10, 2
    labels = ids.copy()
    pos = np.broadcast_to(np.arange(L)[None, None], (3, B, L)).copy()
    images_sam = jnp.asarray(
        rng.normal(size=(B, T, 64, 64, 3)).astype(np.float32)
    )
    gt = jnp.asarray((rng.random((B, T, 32, 32)) > 0.5).astype(np.float32))

    def grads_with(freeze):
        m = UniGR(
            UniGRConfig(
                qwen=cfg.qwen, sam2=cfg.sam2,
                seg=cfg.seg.replace(freeze_sam_backbone=freeze),
            )
        )

        def loss_fn(p):
            return m.apply(
                p, jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(pos),
                None, images_sam, gt, jnp.ones((B,)),
                compute_dtype=jnp.float32, method=UniGR.train_forward,
            )["loss"]

        return jax.grad(loss_fn)(params)

    g_frozen = grads_with(True)
    g_full = grads_with(False)

    trunk_f = g_frozen["params"]["grounding_encoder"]["image_encoder"]
    trunk_g = g_full["params"]["grounding_encoder"]["image_encoder"]
    max_f = max(
        float(jnp.abs(x).max()) for x in jax.tree.leaves(trunk_f)
    )
    max_g = max(
        float(jnp.abs(x).max()) for x in jax.tree.leaves(trunk_g)
    )
    assert max_f == 0.0  # cut holds
    assert max_g > 0.0  # and is not vacuous

    mask = trainable_mask(g_frozen)
    flat_f = jax.tree.leaves(g_frozen)
    flat_g = jax.tree.leaves(g_full)
    flat_m = jax.tree.leaves(mask)
    checked = 0
    for mf, a, b in zip(flat_m, flat_f, flat_g):
        if mf:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            checked += 1
    assert checked > 10
