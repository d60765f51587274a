"""Unit tests for the DYffusion step-mapping math and sampling-schedule DSL.

Golden values come from the documented examples in the reference
(``src/diffusion/dyffusion.py:121-124``):
  h=5, J=1: d_5->4, d_4->3, d_3->2, d_2->1, d_1->0.5
  h=5, J=2: d_6->4, ..., d_2->0.66, d_1->0.33
  h=5, J=3: d_7->4, ..., d_3->0.75, d_2->0.5, d_1->0.25
"""
import jax.numpy as jnp
import numpy as np
import pytest

from dyffusion_tpu.diffusion import StepMapping, parse_sampling_schedule


def make(h, J):
    return StepMapping.create(
        horizon=h,
        schedule="before_t1_only",
        additional_interpolation_steps=J,
        interpolate_before_t1=True,
    )


def test_before_t1_only_golden_examples():
    mp = make(5, 1)
    assert mp.num_timesteps == 6
    assert [mp.i_of(d) for d in range(1, 6)] == [0.5, 1, 2, 3, 4]

    mp = make(5, 2)
    assert mp.num_timesteps == 7
    got = [mp.i_of(d) for d in range(1, 7)]
    assert got[:2] == pytest.approx([1 / 3, 2 / 3])
    assert got[2:] == [1, 2, 3, 4]

    mp = make(5, 3)
    got = [mp.i_of(d) for d in range(1, 8)]
    assert got[:3] == pytest.approx([0.25, 0.5, 0.75])
    assert got[3:] == [1, 2, 3, 4]


def test_scalar_and_array_mapping_agree():
    for mp in [make(5, 3), make(7, 0), make(16, 0)]:
        mp.validate()
        ds = np.arange(1, mp.num_timesteps)
        arr = np.asarray(mp.to_interpolation_step(jnp.asarray(ds, jnp.float32)))
        for d, a in zip(ds, arr):
            assert np.isclose(mp.i_of(int(d)), a, atol=4e-6)


def test_linear_schedule_mapping():
    # linear with factor f: i = (d + add) / (f + 1)
    mp = StepMapping.create(
        horizon=5,
        schedule="linear",
        additional_interpolation_steps_factor=1,
        interpolate_before_t1=True,
    )
    # interpolate_before_t1: add = 0 -> i = d / 2; N = 5 + 1*(5-1) = 9
    assert mp.num_timesteps == 9
    assert mp.i_of(2) == 1.0
    assert mp.i_of(8) == 4.0
    dyn = mp.dynamical_steps
    assert list(dyn.values()) == [1.0, 2.0, 3.0, 4.0]

    mp2 = StepMapping.create(
        horizon=5,
        schedule="linear",
        additional_interpolation_steps_factor=1,
        interpolate_before_t1=False,
    )
    # add = factor = 1 -> i = (d+1)/2; N = 5 + 1*(5-2) = 8
    assert mp2.num_timesteps == 8
    assert mp2.i_of(1) == 1.0
    assert mp2.i_of(7) == 4.0


def test_dynamical_and_artificial_steps():
    mp = make(5, 3)  # N = 8, d in 1..7
    assert mp.dynamical_steps == {4: 1.0, 5: 2.0, 6: 3.0, 7: 4.0}
    assert set(mp.artificial_interpolation_steps) == {1, 2, 3}


def test_sampling_schedule_default_and_dsl():
    mp = make(5, 3)  # N=8
    assert parse_sampling_schedule(None, mp) == list(range(8))
    only_dyn = parse_sampling_schedule("only_dynamics", mp)
    assert only_dyn == [0, 4, 5, 6, 7]
    plus2 = parse_sampling_schedule("only_dynamics_plus2_discrete", mp)
    # adds floor(linspace(0, 4, 3, endpoint=False)) = [0, 1, 2]
    assert plus2 == [0, 1, 2, 4, 5, 6, 7]
    every2 = parse_sampling_schedule("every2", mp)
    assert every2 == [0, 1, 3, 4, 5, 6, 7]
    first1 = parse_sampling_schedule("first1", mp)
    assert first1 == [0, 1, 4, 5, 6, 7]


def test_sampling_schedule_fractional_plus():
    mp = make(5, 0)  # N=5, dynamical d: 1..4 (i=d)
    sched = parse_sampling_schedule("only_dynamics_plus3", mp)
    # linspace(0, 1, 4, endpoint=False) = [0, .25, .5, .75]
    assert sched[:4] == pytest.approx([0, 0.25, 0.5, 0.75])
    assert sched[4:] == [1, 2, 3, 4]


def test_sampling_schedule_monotonic_validation():
    mp = make(5, 0)
    with pytest.raises(AssertionError):
        parse_sampling_schedule([0, 2, 1], mp)
