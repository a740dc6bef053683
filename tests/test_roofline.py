"""VPU roofline model (utils/roofline.py): the jaxpr op accounting must be
exact on known expressions and structurally sane on the kernel models."""
import jax
import jax.numpy as jnp
import pytest

from rtwc_tpu.config import RenderConfig
from rtwc_tpu.utils import roofline


def test_count_known_expressions():
    f32 = jnp.float32
    w = roofline._WEIGHTS
    # x*a + b = one mul + one add, at the measured marginal slot costs
    assert roofline.count_vpu_ops(
        lambda x: x * 2.0 + 1.0, f32(3.0)) == pytest.approx(w["mul"] + w["add"])
    # calibrated transcendental weights
    assert roofline.count_vpu_ops(
        lambda x: jnp.exp(x), f32(1.0)) == pytest.approx(w["exp"])
    assert roofline.count_vpu_ops(
        lambda x: jax.lax.rsqrt(x), f32(1.0)) == pytest.approx(w["rsqrt"])
    # shape ops are free
    assert roofline.count_vpu_ops(
        lambda x: jnp.reshape(x, (4, 1)), jnp.ones((2, 2), jnp.float32)) == 0.0


def test_count_scales_with_elements():
    big = jnp.ones((8, 128), jnp.float32)
    assert roofline.count_vpu_ops(lambda x: x * 2.0, big) == pytest.approx(
        roofline._WEIGHTS["mul"] * 8 * 128)


def test_count_recurses_into_jit():
    inner = jax.jit(lambda x: x * 2.0 + 1.0)
    w = roofline._WEIGHTS
    assert roofline.count_vpu_ops(
        lambda x: inner(x), jnp.float32(1.0)) == pytest.approx(w["mul"] + w["add"])


def test_count_cse_dedupes_repeats():
    # The same subexpression twice costs the same as once (Mosaic CSEs it);
    # y = (x*2+1) used twice -> mul+add+add, not 2*(mul+add)+add.
    w = roofline._WEIGHTS

    def f(x):
        return (x * 2.0 + 1.0) + (x * 2.0 + 1.0)

    assert roofline.count_vpu_ops(f, jnp.float32(3.0)) == pytest.approx(
        w["mul"] + 2 * w["add"])


def test_integer_pow_repeated_squaring():
    # x**32 = 5 squarings -> 2 * (bitlength-1) = 10 muls in the model
    assert roofline.count_vpu_ops(
        lambda x: jax.lax.integer_pow(x, 32), jnp.float32(2.0)
    ) == pytest.approx(10 * roofline._WEIGHTS["mul"])


def test_reduce_counts_input_elements():
    x = jnp.ones((4, 8), jnp.float32)
    assert roofline.count_vpu_ops(lambda x: jnp.max(x), x) == pytest.approx(
        32.0 * roofline._CHEAP)


@pytest.mark.parametrize("shadows", [False, True])
def test_soft_step_model_structure(shadows):
    cfg = RenderConfig(width=256, height=64, max_spheres=8, max_planes=2,
                       soft_miss_penalty=300.0, soft_mask_k=10.0,
                       shadows=shadows)
    m = roofline.soft_step_model(cfg, 0.5, 8, 2)
    assert m["fwd_ops_per_ray"] > 0 and m["bwd_ops_per_ray"] > m["fwd_ops_per_ray"]
    assert m["ops_per_frame"] > m["fwd_ops_per_frame"] > 0
    assert m["t_compute_bound_s"] > 0 and m["t_hbm_bound_s"] > 0
    u = roofline.utilization(m, measured_s=1.0)
    assert set(u) == {"vpu_util", "hbm_util", "bound"}
    assert u["bound"] in ("compute", "hbm")


def test_shadowed_model_costs_more():
    cfg = RenderConfig(width=256, height=64, max_spheres=8, max_planes=2,
                       soft_miss_penalty=300.0, soft_mask_k=10.0)
    m_no = roofline.soft_step_model(cfg, 0.5, 8, 2)
    m_sh = roofline.soft_step_model(cfg.replace(shadows=True), 0.5, 8, 2)
    assert m_sh["fwd_ops_per_ray"] > m_no["fwd_ops_per_ray"]
    assert m_sh["bwd_ops_per_ray"] > m_no["bwd_ops_per_ray"]
    # the shadowed stack saves 14 planes vs 10
    assert m_sh["hbm_bytes_per_frame"] == pytest.approx(
        m_no["hbm_bytes_per_frame"] * 14 / 10)


def test_model_scales_with_objects():
    cfg = RenderConfig(width=256, height=64, max_spheres=64, max_planes=2,
                       soft_miss_penalty=300.0, soft_mask_k=10.0)
    small = roofline.soft_step_model(cfg, 0.5, 8, 2)
    big = roofline.soft_step_model(cfg, 0.5, 64, 2)
    ratio = big["fwd_ops_per_ray"] / small["fwd_ops_per_ray"]
    assert 4.0 < ratio < 9.0  # ~linear in object count (raygen amortizes)
