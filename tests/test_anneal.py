"""Temperature annealing schedule (SURVEY.md section 7 'temperature
schedule' hard part; render/anneal.py)."""
import math

import pytest

from rtwc_tpu.config import RenderConfig
from rtwc_tpu.render.anneal import AnnealSchedule


def test_stage_endpoints_and_monotonicity():
    s = AnnealSchedule(n_stages=5, tau0=0.5, tau1=0.05,
                       mask_k0=10.0, mask_k1=40.0,
                       shadow_k0=10.0, shadow_k1=80.0)
    taus = [s.stage(i)[0] for i in range(5)]
    pens = [s.stage(i)[1] for i in range(5)]
    masks = [s.stage(i)[2] for i in range(5)]
    shadows = [s.stage(i)[3] for i in range(5)]
    assert math.isclose(taus[0], 0.5) and math.isclose(taus[-1], 0.05)
    # penalty defaults to CONSTANT (annealing it floods the image with
    # halos; see AnnealSchedule docstring)
    assert math.isclose(pens[0], 300.0) and math.isclose(pens[-1], 300.0)
    assert math.isclose(masks[0], 10.0) and math.isclose(masks[-1], 40.0)
    assert math.isclose(shadows[-1], 80.0)
    assert all(a > b for a, b in zip(taus, taus[1:]))       # sharpening
    assert all(a < b for a, b in zip(masks, masks[1:]))
    # geometric: constant ratio between consecutive stages
    ratios = [taus[i + 1] / taus[i] for i in range(4)]
    assert max(ratios) - min(ratios) < 1e-9


def test_single_stage_is_sharp():
    s = AnnealSchedule(n_stages=1, tau0=0.5, tau1=0.05)
    assert math.isclose(s.stage(0)[0], 0.05)


def test_configs_replace_softness_fields():
    cfg = RenderConfig(width=8, height=8)
    s = AnnealSchedule(n_stages=3)
    pairs = list(s.configs(cfg))
    assert len(pairs) == 3
    for tau, c in pairs:
        i = pairs.index((tau, c))
        assert c.soft_mask_k == pytest.approx(s.stage(i)[2])
        assert c.soft_miss_penalty == pytest.approx(s.stage(i)[1])
        assert c.width == 8  # everything else untouched


def test_split_steps_partitions_budget():
    s = AnnealSchedule(n_stages=4)
    assert sum(s.split_steps(203)) == 203
    assert s.split_steps(203)[0] >= s.split_steps(203)[-1]
    assert min(s.split_steps(2)) >= 1  # at least one step per stage


def test_validation():
    with pytest.raises(ValueError):
        AnnealSchedule(n_stages=0)
    with pytest.raises(ValueError):
        AnnealSchedule(tau0=-1.0)
    with pytest.raises(IndexError):
        AnnealSchedule(n_stages=2).stage(2)
