"""Compatibility-surface tests (reference GPU class aliases,
``mogp_tpu/compat.py``)."""

import numpy as np
import pytest

import mogp_tpu
from mogp_tpu.compat import (
    GaussianProcessGPU,
    GPUUnavailableError,
    Mat52Base,
    MultiOutputGP_GPU,
    ProductKernel,
    SqExpBase,
    StationaryKernel,
    UniformKernel,
    gpu_usable,
)
from mogp_tpu.models.gp import GaussianProcess
from mogp_tpu.models.mogp import MultiOutputGP
from mogp_tpu.ops.kernels import KernelBase


def test_gpu_classes_alias_standard_classes():
    assert GaussianProcessGPU is GaussianProcess
    assert MultiOutputGP_GPU is MultiOutputGP


def test_gpu_class_workflow_runs():
    """Reference migration code using the GPU names must just work."""
    rng = np.random.RandomState(30)
    x = rng.rand(20, 2)
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    gp = mogp_tpu.fit_GP_MAP(GaussianProcessGPU(x, y, nugget="adaptive"),
                             n_tries=2)
    mu, var, _ = gp.predict(rng.rand(5, 2))
    assert np.all(np.isfinite(np.asarray(mu)))
    mgp = MultiOutputGP_GPU(x, np.stack([y, -y]))
    assert mgp.n_emulators == 2


def test_gpu_usable_is_bool():
    assert isinstance(gpu_usable(), bool)
    # the test suite forces the CPU backend (conftest)
    assert gpu_usable() is False


def test_gpu_unavailable_error_catchable():
    # reference except-clauses must still be valid
    assert issubclass(GPUUnavailableError, RuntimeError)
    with pytest.raises(GPUUnavailableError):
        raise GPUUnavailableError("no device")


def test_kernel_base_aliases():
    for alias in (StationaryKernel, UniformKernel, ProductKernel):
        assert alias is KernelBase
    r2 = np.array([0.0, 1.0, 4.0])
    assert np.allclose(np.asarray(SqExpBase.calc_K(r2)),
                       np.exp(-0.5 * r2))
    m = np.asarray(Mat52Base.calc_K(r2))
    assert m[0] == pytest.approx(1.0)
    assert np.all(np.diff(m) < 0)  # decreasing in distance
