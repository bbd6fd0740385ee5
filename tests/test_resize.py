"""Resize / normalize vs torch F.interpolate(align_corners=False)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from rga3_tpu.ops import resize


def test_bilinear_matches_torch_align_corners_false():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 17, 23)).astype(np.float32)
    got = np.asarray(resize.resize_bilinear(jnp.asarray(x), (32, 48)))
    ref = F.interpolate(
        torch.tensor(x), (32, 48), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_postprocess_masks_matches_torch():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(4, 1, 256, 256)).astype(np.float32)
    got = np.asarray(
        resize.postprocess_masks(jnp.asarray(m), (768, 1024), (120, 160))
    )
    t = torch.tensor(m)
    t = F.interpolate(t, (1024, 1024), mode="bilinear", align_corners=False)
    t = t[..., :768, :1024]
    ref = F.interpolate(t, (120, 160), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-3, atol=1e-3)


def test_sam_preprocess_pads_and_normalizes():
    x = np.full((3, 700, 1024), 123.675, np.float32)
    out = np.asarray(resize.sam_preprocess(jnp.asarray(x)))
    assert out.shape == (3, 1024, 1024)
    assert abs(out[0, 0, 0]) < 1e-5  # mean-normalized channel 0
    assert abs(out[0, 1023, 0]) < 1e-7  # padded region is zero post-normalize


def test_bicubic_matches_torch():
    """resize_bicubic_torch must reproduce F.interpolate(mode='bicubic',
    align_corners=False) — the SAM2 pos-embed path (a=-0.75 kernel,
    which jax.image.resize does not implement)."""
    import torch
    import torch.nn.functional as F

    from rga3_tpu.ops.resize import resize_bicubic_torch

    rng = np.random.default_rng(0)
    for (h, w), (oh, ow) in [((7, 7), (64, 64)), ((16, 12), (9, 30)),
                             ((5, 9), (5, 9))]:
        x = rng.normal(size=(2, 3, h, w)).astype(np.float32)
        ours = np.asarray(resize_bicubic_torch(jnp.asarray(x), (oh, ow)))
        theirs = F.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="bicubic",
            align_corners=False,
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
