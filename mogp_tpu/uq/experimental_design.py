"""One-shot experimental designs (Monte Carlo / Latin Hypercube / MaxiMin).

TPU-native re-design of ``mogp_emulator/ExperimentalDesign.py``: the API
(PPF-based parameter specification with the same five input conventions,
``ExperimentalDesign.py:32-188``) is preserved, but sampling is
vectorized:

* the PPF mapping applies per-column over the whole draw instead of the
  reference's per-element double loop (``ExperimentalDesign.py:276-280``);
* MaxiMin search (``ExperimentalDesign.py:628-668``: 1000 serial LHC
  draws, each scored with ``scipy.spatial.distance.pdist``) generates all
  candidate hypercubes at once and scores their min pairwise distances in
  one batched device computation -- the argmax over tries is a single
  reduction.
"""

from inspect import signature

import numpy as np
import scipy.stats

import jax
import jax.numpy as jnp

__all__ = [
    "ExperimentalDesign",
    "MonteCarloDesign",
    "LatinHypercubeDesign",
    "MaxiMinLHC",
]


class ExperimentalDesign:
    """Base one-shot design with uncorrelated parameters
    (``ExperimentalDesign.py:6-295``).

    Parameter space is specified by PPF (inverse-CDF) functions, one per
    parameter; sampling draws from ``[0,1]^n`` (method-specific) and maps
    through the PPFs.
    """

    def __init__(self, *args):
        if len(args) == 1:
            try:
                n_parameters = int(args[0])
                bounds = None
            except TypeError:
                try:
                    n_parameters = len(list(args[0]))
                    bounds = list(args[0])
                except TypeError:
                    raise TypeError("bad input type for ExperimentalDesign")
        elif len(args) == 2:
            try:
                n_parameters = int(args[0])
            except TypeError:
                raise TypeError("bad input type for ExperimentalDesign")
            if callable(args[1]):
                bounds = args[1]
            else:
                try:
                    bounds = list(args[1])
                    try:
                        if (
                            len(bounds) == 2
                            and isinstance(float(bounds[0]), float)
                            and isinstance(float(bounds[1]), float)
                        ):
                            if float(bounds[1]) <= float(bounds[0]):
                                raise ValueError(
                                    "bad value for parameter bounds in "
                                    "ExperimentalDesign"
                                )
                            bounds = (float(bounds[0]), float(bounds[1]))
                    except TypeError:
                        pass
                except TypeError:
                    raise TypeError("bad input type for ExperimentalDesign")
        else:
            raise ValueError("bad inputs for ExperimentalDesign")

        if n_parameters <= 0:
            raise ValueError(
                "number of parameters must be positive in Experimental Design"
            )
        self.n_parameters = n_parameters

        if bounds is None:
            self.distributions = [
                scipy.stats.uniform(loc=0.0, scale=1.0).ppf
            ] * n_parameters
        elif isinstance(bounds, tuple):
            self.distributions = [
                scipy.stats.uniform(loc=bounds[0], scale=bounds[1] - bounds[0]).ppf
            ] * n_parameters
        elif callable(bounds):
            if len(signature(bounds).parameters) == 1:
                self.distributions = [bounds] * n_parameters
            else:
                raise ValueError(
                    "PPF distribution provided must accept a single argument"
                )
        else:
            if not len(bounds) == n_parameters:
                raise ValueError(
                    "list of parameter distributions must have the same length"
                )
            self.distributions = []
            for item in bounds:
                if callable(item):
                    if len(signature(item).parameters) == 1:
                        self.distributions.append(item)
                    else:
                        raise ValueError(
                            "PPF distribution provided must accept a single argument"
                        )
                else:
                    try:
                        if (
                            len(item) == 2
                            and isinstance(float(item[0]), float)
                            and isinstance(float(item[1]), float)
                        ):
                            if float(item[1]) <= float(item[0]):
                                raise ValueError(
                                    "bad value for parameter bounds in "
                                    "ExperimentalDesign"
                                )
                            self.distributions.append(
                                scipy.stats.uniform(
                                    loc=float(item[0]),
                                    scale=float(item[1]) - float(item[0]),
                                ).ppf
                            )
                        else:
                            raise ValueError(
                                "bounds for each parameter must be a tuple of "
                                "two floats"
                            )
                    except TypeError:
                        raise TypeError(
                            "bounds for each parameter must be a tuple of two floats"
                        )

    def get_n_parameters(self):
        return self.n_parameters

    def get_method(self):
        try:
            return self.method
        except AttributeError:
            raise NotImplementedError(
                "base class of ExperimentalDesign does not implement a method"
            )

    def _draw_samples(self, n_samples):
        raise NotImplementedError

    def sample(self, n_samples, **kwargs):
        """Draw parameter samples (``ExperimentalDesign.py:239-284``).

        PPF application is vectorized per parameter column."""
        n_samples = int(n_samples)
        assert n_samples > 0, "number of samples must be positive"

        random_draws = self._draw_samples(n_samples, **kwargs)
        assert np.all(random_draws >= 0.0) and np.all(random_draws <= 1.0), (
            "error in generating random samples"
        )

        sample_values = np.empty((n_samples, self.get_n_parameters()))
        for index, dist in enumerate(self.distributions):
            try:
                sample_values[:, index] = np.asarray(
                    dist(random_draws[:, index])
                ).reshape(-1)
            except (TypeError, ValueError):
                # PPF that only accepts scalars
                sample_values[:, index] = [
                    dist(v) for v in random_draws[:, index]
                ]

        assert np.all(np.isfinite(sample_values)), (
            "error due to non-finite values of parameters"
        )
        return sample_values

    def __str__(self):
        try:
            method = self.get_method() + " "
        except NotImplementedError:
            method = ""
        return (
            method
            + "Experimental Design with "
            + str(self.get_n_parameters())
            + " parameters"
        )


class MonteCarloDesign(ExperimentalDesign):
    """Monte Carlo design (``ExperimentalDesign.py:297-430``)."""

    def __init__(self, *args):
        self.method = "Monte Carlo"
        super().__init__(*args)

    def _draw_samples(self, n_samples, **kwargs):
        return np.random.random((int(n_samples), self.get_n_parameters()))


class LatinHypercubeDesign(ExperimentalDesign):
    """Latin Hypercube design (``ExperimentalDesign.py:432-584``): each
    sample occupies a unique stratum of each parameter's distribution."""

    def __init__(self, *args):
        self.method = "Latin Hypercube"
        super().__init__(*args)

    def _draw_samples(self, n_samples, **kwargs):
        n_samples = int(n_samples)
        assert n_samples > 0, "number of samples must be positive"
        n_parameters = self.get_n_parameters()
        # shuffled strata + intra-stratum jitter (ExperimentalDesign.py:550-580)
        strata = np.argsort(
            np.random.random((n_samples, n_parameters)), axis=0
        ).astype(np.float64)
        samples = (strata + np.random.random((n_samples, n_parameters))) / float(
            n_samples
        )
        assert np.all(samples >= 0.0) and np.all(samples <= 1.0)
        return samples


@jax.jit
def _min_pdist_batch(candidates):
    """Minimum pairwise Euclidean distance per candidate design.

    ``candidates``: (n_tries, n_samples, D).  One batched device
    computation replacing the reference's 1000 serial ``pdist`` calls
    (``ExperimentalDesign.py:663-668``).
    """
    sq = jnp.sum(candidates**2, axis=-1)
    cross = jnp.einsum("tnd,tmd->tnm", candidates, candidates)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
    n = candidates.shape[1]
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye[None], jnp.inf, d2)
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=(1, 2)), 0.0))


class MaxiMinLHC(LatinHypercubeDesign):
    """MaxiMin Latin Hypercube (``ExperimentalDesign.py:586-674``): of
    ``n_tries`` LHC draws, keep the one maximizing the minimum pairwise
    distance.  All candidates are generated and scored in one batch."""

    def __init__(self, *args):
        self.method = "MaxiMinLHC"
        super().__init__(*args)

    def _draw_samples(self, n_samples, n_tries=1000, **kwargs):
        n_samples = int(n_samples)
        n_tries = int(n_tries)
        assert n_samples > 0, "number of samples must be positive"
        assert n_tries > 0, "n_tries must be a positive integer"
        n_parameters = self.get_n_parameters()

        strata = np.argsort(
            np.random.random((n_tries, n_samples, n_parameters)), axis=1
        ).astype(np.float64)
        candidates = (
            strata + np.random.random((n_tries, n_samples, n_parameters))
        ) / float(n_samples)

        # chunk the tries axis so the (chunk, n, n) distance tensor stays
        # bounded in memory for large designs
        max_elems = 1 << 26
        chunk = max(1, int(max_elems // max(n_samples * n_samples, 1)))
        min_dists = np.empty(n_tries)
        for c0 in range(0, n_tries, chunk):
            block = candidates[c0 : c0 + chunk]
            min_dists[c0 : c0 + len(block)] = np.asarray(
                _min_pdist_batch(jnp.asarray(block))
            )
        best = int(np.argmax(min_dists))
        best_samples = candidates[best]
        assert np.all(best_samples >= 0.0) and np.all(best_samples <= 1.0)
        return best_samples
