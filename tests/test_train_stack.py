"""Training stack on the 8-device CPU mesh: sharded state, grad-accum step,
LoRA trainability masking, schedule shape."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rga3_tpu.config import MeshConfig, TrainConfig
from rga3_tpu.parallel.mesh import make_mesh
from rga3_tpu.parallel.sharding import infer_param_sharding
from rga3_tpu.train.optimizer import lr_schedule, trainable_mask
from rga3_tpu.train.step import build_train_step, make_train_state


@pytest.mark.slow
def test_dryrun_multichip_8():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_trainable_mask_patterns():
    params = {
        "params": {
            "qwen": {
                "lm": {
                    "model": {
                        "layers_0": {
                            "self_attn": {
                                "q_proj": {"kernel": np.zeros(2)},
                                "q_proj_lora_a": np.zeros(2),
                            }
                        }
                    },
                    "embed_tokens": {"embedding": np.zeros(2)},
                },
            },
            "grounding_encoder": {
                "sam_mask_decoder": {"iou_token": {"embedding": np.zeros(2)}},
                "image_encoder": {"trunk": {"pos_embed": np.zeros(2)}},
            },
            "text_hidden_fcs": {"fc1": {"kernel": np.zeros(2)}},
        }
    }
    m = params["params"]
    mask = trainable_mask(params)["params"]
    assert not mask["qwen"]["lm"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert mask["qwen"]["lm"]["model"]["layers_0"]["self_attn"]["q_proj_lora_a"]
    assert mask["qwen"]["lm"]["embed_tokens"]["embedding"]
    assert mask["grounding_encoder"]["sam_mask_decoder"]["iou_token"]["embedding"]
    assert not mask["grounding_encoder"]["image_encoder"]["trunk"]["pos_embed"]
    assert mask["text_hidden_fcs"]["fc1"]["kernel"]


def test_lr_schedule_warmup_cosine_floor():
    cfg = TrainConfig(lr=1e-3, epochs=10, steps_per_epoch=100,
                      warmup_ratio=0.1, min_lr_ratio=0.05)
    sched = lr_schedule(cfg)
    assert float(sched(0)) < 1e-5
    assert abs(float(sched(100)) - 1e-3) < 1e-6  # peak after warmup
    assert float(sched(999)) >= 1e-3 * 0.05 - 1e-9  # floor
    assert float(sched(500)) < 1e-3


def test_frozen_params_do_not_change():
    cfg = TrainConfig(grad_accum_steps=1, lr=1e-2)
    params = {
        "params": {
            "frozen_dense": {"kernel": jnp.ones((4, 4))},
            "lm_head": {"kernel": jnp.ones((4, 4))},
        }
    }
    state, tx = make_train_state(cfg, params)

    def loss_fn(p, batch):
        y = batch["x"] @ p["params"]["frozen_dense"]["kernel"]
        y = y @ p["params"]["lm_head"]["kernel"]
        return {"loss": jnp.sum(y**2)}

    step = build_train_step(loss_fn, tx, grad_accum_steps=1, donate=False)
    batch = {"x": jnp.ones((1, 2, 4))}
    new_state, aux = step(state, batch)
    # step 0 has lr == 0 (warmup from zero); take a second step
    new_state, aux = step(new_state, batch)
    np.testing.assert_allclose(
        np.asarray(new_state.params["params"]["frozen_dense"]["kernel"]),
        np.ones((4, 4)),
    )
    assert (
        np.abs(
            np.asarray(new_state.params["params"]["lm_head"]["kernel"]) - 1.0
        ).max()
        > 1e-6
    )


def test_infer_param_sharding_fsdp_axis():
    mesh = make_mesh(MeshConfig(data=2, fsdp=4, tensor=1))
    params = {"w": np.zeros((16, 6)), "b": np.zeros((3,)), "s": np.zeros(())}
    sh = infer_param_sharding(params, mesh)
    assert sh["w"].spec == jax.sharding.PartitionSpec("fsdp", None)
    assert sh["b"].spec == jax.sharding.PartitionSpec(None)
    assert sh["s"].spec == jax.sharding.PartitionSpec()


def test_adam_mu_dtype_bf16():
    """adam_mu_dtype=bfloat16 halves the first-moment slice of optimizer
    HBM; the variance stays f32, and a step still updates params."""
    import optax
    from rga3_tpu.train.optimizer import build_optimizer

    params = {"params": {"qwen": {"lm_head": {
        "kernel": jnp.ones((8, 4), jnp.float32)}}}}
    tx = build_optimizer(
        TrainConfig(adam_mu_dtype="bfloat16", epochs=1, steps_per_epoch=2),
        params,
    )
    state = tx.init(params)
    mus = [
        x.dtype for x in jax.tree.leaves(state)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16
    ]
    assert mus, "no bf16 moment found in the optimizer state"
    grads = jax.tree.map(jnp.ones_like, params)
    # step 0 sits at warmup lr=0; the second step must move params
    updates, state = tx.update(grads, state, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(jax.tree.leaves(updates)[0]).max()) > 0
