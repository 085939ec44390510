"""S3D backbone tests: forward shapes, space-to-depth equivalence, and
torch-checkpoint conversion plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def s3d_setup():
    # real model.init of the 60+-conv backbone costs >80s on CPU (eager
    # threefry sampling / init-graph compile); the tests only need the
    # parameter TREE, so trace shapes with eval_shape (no compute) and
    # fill positive numpy values (positive keeps batchnorm var valid)
    from coot_videotext_tpu.models.s3d import S3D
    model = S3D(num_classes=512)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 32, 32, 3),
                    jnp.float32)
    shapes = jax.eval_shape(
        lambda r: model.init(r, x), jax.random.PRNGKey(0))["params"]
    rng = np.random.RandomState(0)

    def fill(path, s):
        name = path[-1].key
        if name == "kernel":  # small centered conv/fc weights
            v = 0.05 * rng.standard_normal(s.shape)
        elif name == "var":
            v = np.full(s.shape, 1.0)
        elif name in ("scale", "weight"):
            v = np.ones(s.shape)
        else:  # bias / mean
            v = np.zeros(s.shape)
        return jnp.asarray(v.astype(np.float32))

    params = jax.tree_util.tree_map_with_path(fill, shapes)
    return model, params, x

def test_s3d_forward_shapes(s3d_setup):
    model, params, x = s3d_setup
    out = model.apply({"params": params}, x)
    assert out["video_embedding"].shape == (1, 512)
    assert out["mixed_5c"].shape == (1, 1024)
    assert out["before_mean"].shape[-1] == 1024
    assert np.isfinite(np.asarray(out["video_embedding"])).all()


def test_s3d_torch_weight_conversion(s3d_setup):
    """Converter maps a torch-layout state dict onto every conv/bn/fc."""
    from coot_videotext_tpu.models.s3d import (
        load_torch_s3d_weights, _convert_conv)
    model, params, x = s3d_setup
    rng = np.random.RandomState(1)

    # synthesize a torch-style state dict from the flax tree structure
    sd = {}
    def build(tree, prefix):
        for name, sub in tree.items():
            path = f"{prefix}.{name}" if prefix else name
            if isinstance(sub, dict) and "kernel" in sub:
                k = np.asarray(sub["kernel"])
                if k.ndim == 5:  # DHWIO -> torch OIDHW
                    sd[f"{path}.weight"] = (0.01 * rng.randn(
                        k.shape[4], k.shape[3], *k.shape[:3])).astype(
                        np.float32)
                else:
                    sd[f"{path}.weight"] = (0.01 * rng.randn(
                        k.shape[1], k.shape[0])).astype(np.float32)
                if "bias" in sub:
                    sd[f"{path}.bias"] = rng.randn(
                        *np.shape(sub["bias"])).astype(np.float32)
            elif isinstance(sub, dict) and "mean" in sub:
                n = np.shape(sub["mean"])[0]
                sd[f"{path}.weight"] = rng.rand(n).astype(np.float32) + .5
                sd[f"{path}.bias"] = rng.randn(n).astype(np.float32)
                sd[f"{path}.running_mean"] = rng.randn(n).astype(
                    np.float32)
                sd[f"{path}.running_var"] = rng.rand(n).astype(
                    np.float32) + .5
            elif isinstance(sub, dict):
                build(sub, path)
    tree = jax.tree_util.tree_map(np.asarray, params)
    build(tree, "")

    new_params = load_torch_s3d_weights(params, sd)
    # every leaf replaced (not equal to the random init)
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        params, new_params)
    assert all(jax.tree_util.tree_leaves(changed))
    # conv kernel transposition round-trips
    k_flax = np.asarray(new_params["conv1"]["conv1"]["kernel"])
    k_torch = sd["conv1.conv1.weight"]
    np.testing.assert_array_equal(k_flax, _convert_conv(k_torch))
    # model still runs with converted weights
    out = model.apply({"params": new_params}, x)
    assert np.isfinite(np.asarray(out["video_embedding"])).all()
