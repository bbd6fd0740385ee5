"""RoPE variants vs torch reference math (rotate_half, M-RoPE section merge,
SAM2 axial complex rotation)."""
import numpy as np
import jax.numpy as jnp
import torch

from rga3_tpu.ops import rope


def _torch_rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat((-x2, x1), dim=-1)


def test_apply_rope_matches_torch():
    rng = np.random.default_rng(0)
    B, L, H, D = 2, 10, 4, 32
    x = rng.normal(size=(B, L, H, D)).astype(np.float32)
    pos = np.arange(L)[None, :].repeat(B, 0)
    cos, sin = rope.rope_cos_sin(jnp.asarray(pos), D, theta=1e6)
    got = np.asarray(rope.apply_rope(jnp.asarray(x), cos, sin))

    inv = 1.0 / (1e6 ** (np.arange(0, D, 2) / D))
    freqs = np.einsum("bl,d->bld", pos.astype(np.float64), inv)
    emb = np.concatenate([freqs, freqs], -1)
    tc = torch.tensor(np.cos(emb), dtype=torch.float32)[:, :, None, :]
    ts = torch.tensor(np.sin(emb), dtype=torch.float32)[:, :, None, :]
    tx = torch.tensor(x)
    ref = (tx * tc + _torch_rotate_half(tx) * ts).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_mrope_section_merge_matches_hf_scheme():
    """Verify the section-merge equals HF's split(mrope_section*2) + i%3."""
    rng = np.random.default_rng(1)
    B, L, D = 2, 7, 128
    section = (16, 24, 24)
    pos = rng.integers(0, 50, size=(3, B, L))
    cos, sin = rope.mrope_cos_sin(jnp.asarray(pos), D, 1e6, section)

    inv = 1.0 / (1e6 ** (np.arange(0, D, 2) / D))
    freqs = pos[..., None].astype(np.float64) * inv  # (3,B,L,64)
    emb = np.concatenate([freqs, freqs], -1)  # (3,B,L,128)
    tcos = torch.tensor(np.cos(emb))
    tsin = torch.tensor(np.sin(emb))
    sec2 = list(section) * 2
    ref_cos = torch.cat(
        [m[i % 3] for i, m in enumerate(tcos.split(sec2, dim=-1))], dim=-1
    ).numpy()
    ref_sin = torch.cat(
        [m[i % 3] for i, m in enumerate(tsin.split(sec2, dim=-1))], dim=-1
    ).numpy()
    # fp32 table vs fp64 reference: trig arg error ~1e-7 * pos * inv_freq
    np.testing.assert_allclose(np.asarray(cos), ref_cos, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sin), ref_sin, rtol=1e-3, atol=1e-4)


def test_axial_cis_matches_complex_reference():
    """Interleaved rotation == torch complex multiply with axial freqs_cis
    (the compute_axial_cis / apply_rotary_enc convention)."""
    dim, ex, ey = 16, 4, 3
    cos, sin = rope.axial_cos_sin(ex, ey, dim)
    L = ex * ey
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, L, dim)).astype(np.float32)
    got = np.asarray(
        rope.apply_rotary_interleaved(jnp.asarray(x), cos, sin)
    )

    freqs = 1.0 / (
        10000 ** (np.arange(0, dim, 4)[: dim // 4].astype(np.float64) / dim)
    )
    t = np.arange(L, dtype=np.float64)
    tx, ty = t % ex, np.floor(t / ex)
    fx = np.outer(tx, freqs)
    fy = np.outer(ty, freqs)
    ang = np.concatenate([fx, fy], -1)  # (L, dim/2)
    freqs_cis = torch.polar(
        torch.ones(L, dim // 2, dtype=torch.float64), torch.tensor(ang)
    )
    xt = torch.tensor(x, dtype=torch.float64)
    x_ = torch.view_as_complex(xt.reshape(2, L, dim // 2, 2))
    ref = torch.view_as_real(x_ * freqs_cis[None]).flatten(-2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_vision_rope_shapes():
    hpos = jnp.asarray(np.repeat(np.arange(4), 4))
    wpos = jnp.asarray(np.tile(np.arange(4), 4))
    cos, sin = rope.vision_rope_cos_sin(hpos, wpos, head_dim=80)
    assert cos.shape == (16, 80)
    assert sin.shape == (16, 80)
