"""opt_keys param-group semantics (ref utils/optimizer_utils.py:34-132).

The upnswin recipe zeroes weight decay for params whose TORCH name contains
'absolute_pos_embed' / 'norm' / 'relative_position_bias_table'.  In torch,
BatchNorms inside nn.Sequential have numeric names (fpn.ppm_conv.0.1.*), so
the 'norm' key exempts ONLY LayerNorms — BN affine params keep full decay.
Our ConvBN scopes its BN as <x>/norm/bn/, which would wrongly match; the
optimizer matches on a torch-faithful rewritten path.  Pinned here with a
zero-gradient AdamW step: decayed params shrink by lr*wd*w, exempt ones
don't move.
"""
import jax.numpy as jnp
import numpy as np

from mscs_tpu.train.optim import build_optimizer

LR, WD = 0.1, 0.5


def _step(params, opt_keys):
    tx = build_optimizer(
        {"optim": "AdamW", "weight_decay": WD, "betas": (0.9, 0.999),
         "opt_keys": opt_keys}, lambda _: LR, params)
    state = tx.init(params)
    grads = jnp.zeros_like(params) if not isinstance(params, dict) else \
        {k: _zeros(v) for k, v in params.items()}
    updates, _ = tx.update(grads, state, params)
    import optax
    return optax.apply_updates(params, updates)


def _zeros(tree):
    if isinstance(tree, dict):
        return {k: _zeros(v) for k, v in tree.items()}
    return jnp.zeros_like(tree)


def test_norm_key_exempts_layernorm_but_not_convbn_bn():
    params = {
        "backbone": {
            "stage0_block0": {"norm1": {"scale": jnp.ones((4,))}},
            "absolute_pos_embed": jnp.ones((1, 2, 2, 4)),
            "stage0_block0_attn": {
                "relative_position_bias_table": jnp.ones((9, 2))},
        },
        "fpn": {"ppm_conv0": {
            "conv": {"conv": {"kernel": jnp.ones((1, 1, 4, 4))}},
            "norm": {"bn": {"scale": jnp.ones((4,)),
                            "bias": jnp.ones((4,))}},
        }},
    }
    opt_keys = {"absolute_pos_embed": {"wd_mult": 0.0},
                "norm": {"wd_mult": 0.0},
                "relative_position_bias_table": {"wd_mult": 0.0}}
    new = _step(params, opt_keys)

    decayed = 1.0 - LR * WD
    # LayerNorm ('norm1' in path), ape, bias table: exempt — unchanged
    np.testing.assert_allclose(
        new["backbone"]["stage0_block0"]["norm1"]["scale"], 1.0)
    np.testing.assert_allclose(new["backbone"]["absolute_pos_embed"], 1.0)
    np.testing.assert_allclose(
        new["backbone"]["stage0_block0_attn"]
        ["relative_position_bias_table"], 1.0)
    # conv kernel and ConvBN's BN affine params: decayed like torch
    np.testing.assert_allclose(
        new["fpn"]["ppm_conv0"]["conv"]["conv"]["kernel"], decayed,
        rtol=1e-6)
    np.testing.assert_allclose(
        new["fpn"]["ppm_conv0"]["norm"]["bn"]["scale"], decayed, rtol=1e-6)
    np.testing.assert_allclose(
        new["fpn"]["ppm_conv0"]["norm"]["bn"]["bias"], decayed, rtol=1e-6)
