"""Sampler reproducibility against the reference's literal expected values
(reference: tests/test_parameters.py:6-30). Certifies that the native
ParameterSampler reproduces sklearn's sorted-key sampling semantics
bit-for-bit under fixed seeds."""

import numpy as np

from romtime_tpu.parameters import (
    ParameterSampler,
    get_uniform_dist,
    parameters_to_array,
    array_to_parameters,
    round_parameter_list,
    round_parameters,
)


def test_parameter_handler():

    rng = np.random.RandomState(0)

    grid = {
        "alpha": get_uniform_dist(min=1.0, max=10.0),
        "delta": get_uniform_dist(min=-10.0, max=5.0),
        "epsilon": get_uniform_dist(min=0.0, max=1.0),
        "beta": [0.5],
    }

    sampler = ParameterSampler(param_distributions=grid, n_iter=5, random_state=rng)
    param_list = list(sampler)

    rounded_list = round_parameter_list(param_list, num=2)

    expected = [
        {"alpha": 5.94, "beta": 0.5, "delta": 0.73, "epsilon": 0.6},
        {"alpha": 5.9, "beta": 0.5, "delta": -3.65, "epsilon": 0.65},
        {"alpha": 4.94, "beta": 0.5, "delta": 3.38, "epsilon": 0.96},
        {"alpha": 4.45, "beta": 0.5, "delta": 1.88, "epsilon": 0.53},
        {"alpha": 6.11, "beta": 0.5, "delta": 3.88, "epsilon": 0.07},
    ]

    assert rounded_list == expected


def test_sampler_accepts_int_seed():
    grid = {"a": get_uniform_dist(min=0.0, max=1.0)}
    s1 = list(ParameterSampler(grid, n_iter=3, random_state=7))
    s2 = list(ParameterSampler(grid, n_iter=3, random_state=7))
    assert s1 == s2


def test_round_parameters():
    assert round_parameters({"a": 1.23456}, num=2) == {"a": 1.23}


def test_parameters_array_roundtrip():
    mus = [{"a": 1.0, "b": 2.0}, {"a": 3.0, "b": 4.0}]
    arr, names = parameters_to_array(mus)
    assert names == ["a", "b"]
    assert arr.shape == (2, 2)
    back = array_to_parameters(arr, names)
    assert back == mus
