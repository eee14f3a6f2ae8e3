"""Parameter-space sampling.

Mirrors the reference semantics (reference: src/romtime/parameters.py:4-25 and
rom/base.py:98-120, which delegate to ``sklearn.model_selection.
ParameterSampler``): a grid maps parameter names to either scipy-style frozen
distributions (anything with ``.rvs``) or finite lists. Samples are drawn with
a ``numpy.random.RandomState`` stream, iterating keys in *sorted* order — the
sorted-key iteration is load-bearing for reproducibility, and is checked
against the reference's literal expected values in tests/test_parameters.py.

Implemented natively (no sklearn dependency) so the sampler can be driven by
the same seeds on any host that feeds the TPU pipeline.
"""

import numpy as np
from scipy.stats.distributions import uniform


def get_uniform_dist(min, max):
    """Frozen U[min, max] distribution (reference: parameters.py:4-9)."""
    loc = min
    scale = max - min
    return uniform(loc=loc, scale=scale)


def round_parameters(sample, num=2):
    """Round a single parameter dict (reference: parameters.py:12-16)."""
    return dict((k, round(v, num)) for (k, v) in sample.items())


def round_parameter_list(param_list, num=2):
    """Round a list of parameter dicts (reference: parameters.py:19-25)."""
    return [dict((k, round(v, num)) for (k, v) in d.items()) for d in param_list]


def check_random_state(seed):
    """Coerce ``seed`` into a ``numpy.random.RandomState``.

    Accepts None (fresh nondeterministic state), ints, and RandomState
    instances — the same contract sklearn uses, so reference seeds
    reproduce identical parameter streams.
    """
    if seed is None:
        return np.random.RandomState()
    if isinstance(seed, (int, np.integer)):
        return np.random.RandomState(seed)
    if isinstance(seed, np.random.RandomState):
        return seed
    raise ValueError(f"Cannot build a RandomState from {seed!r}.")


class ParameterSampler:
    """Random sampler over a dict of distributions/lists.

    Drop-in replacement for ``sklearn.model_selection.ParameterSampler`` in
    the configurations this framework uses (every grid value is either a
    frozen scipy distribution or a list).

    Parameters
    ----------
    param_distributions : dict
        name -> frozen distribution (has ``.rvs``) or list of values.
    n_iter : int
        Number of parameter dicts to yield.
    random_state : None, int or np.random.RandomState
    """

    def __init__(self, param_distributions, n_iter, random_state=None):
        self.param_distributions = param_distributions
        self.n_iter = int(n_iter)
        self.random_state = random_state

    def __len__(self):
        return self.n_iter

    def __iter__(self):
        rng = check_random_state(self.random_state)
        items = sorted(self.param_distributions.items())
        for _ in range(self.n_iter):
            sample = dict()
            for key, value in items:
                if hasattr(value, "rvs"):
                    sample[key] = value.rvs(random_state=rng)
                else:
                    sample[key] = value[rng.randint(len(value))]
            yield sample


def sample_parameters(grid, num, random_state=None):
    """Materialize ``num`` samples from ``grid`` as a list of dicts."""
    return list(ParameterSampler(grid, n_iter=num, random_state=random_state))


def parameters_to_array(mu_list, names=None):
    """Stack a list of parameter dicts into a (num, n_params) array.

    The column order is ``names`` if given, else sorted key order. This is
    the bridge between the dict-based user API and the batched (vmapped /
    sharded) μ-sweep kernels, which want a dense parameter matrix.
    """
    if names is None:
        names = sorted(mu_list[0].keys())
    arr = np.array([[float(mu[name]) for name in names] for mu in mu_list])
    return arr, list(names)


def array_to_parameters(arr, names):
    """Inverse of :func:`parameters_to_array`."""
    return [dict(zip(names, row)) for row in np.asarray(arr)]
