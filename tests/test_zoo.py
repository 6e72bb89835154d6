"""Zoo tests: constructor configs, invalid args, and torch checkpoint import
parity (a torch-built g_a/g_s stack vs the imported flax transforms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compressai_environment_tpu.zoo import (
    bmshj2018_factorized,
    cfgs,
    image_models,
    load_state_dict,
    rename_key,
)
from compressai_environment_tpu.models.google import FactorizedPriorNet

torch = pytest.importorskip("torch")


class TestZooConstructors:
    @pytest.mark.parametrize("name", list(image_models))
    def test_configs_exist(self, name):
        assert len(cfgs[name]) >= 6

    def test_invalid_quality(self):
        with pytest.raises(ValueError):
            bmshj2018_factorized(0)
        with pytest.raises(ValueError):
            bmshj2018_factorized(9)

    def test_invalid_metric(self):
        with pytest.raises(ValueError):
            bmshj2018_factorized(1, metric="psnr")

    def test_constructs_channels(self):
        m = bmshj2018_factorized(1)
        assert (m.N, m.M) == (128, 192)
        m = bmshj2018_factorized(8)
        assert (m.N, m.M) == (192, 320)


class TestRenameKey:
    def test_module_prefix(self):
        assert rename_key("module.g_a.0.weight") == "g_a.0.weight"

    def test_parameterlist(self):
        assert rename_key("entropy_bottleneck._biases.0") == "entropy_bottleneck._bias0"
        assert (
            rename_key("entropy_bottleneck._matrices.2")
            == "entropy_bottleneck._matrix2"
        )
        assert (
            rename_key("entropy_bottleneck._factors.1")
            == "entropy_bottleneck._factor1"
        )

    def test_downsample(self):
        assert rename_key("g_a.0.downsample.weight") == "g_a.0.skip.weight"


def _torch_factorized(N, M):
    """The reference bmshj2018-factorized transforms rebuilt in plain torch
    (only used as a numerical oracle)."""
    import torch.nn as nn

    class TorchGDN(nn.Module):
        def __init__(self, c, inverse=False):
            super().__init__()
            self.inverse = inverse
            ped = (2**-18) ** 2
            self.beta = nn.Parameter(torch.sqrt(torch.ones(c) + ped))
            self.gamma = nn.Parameter(torch.sqrt(0.1 * torch.eye(c) + ped))
            self.ped = ped

        def forward(self, x):
            c = x.size(1)
            beta = torch.clamp(self.beta, min=(1e-6 + self.ped) ** 0.5) ** 2 - self.ped
            gamma = torch.clamp(self.gamma, min=self.ped**0.5) ** 2 - self.ped
            norm = torch.nn.functional.conv2d(x**2, gamma.reshape(c, c, 1, 1), beta)
            norm = torch.sqrt(norm) if self.inverse else torch.rsqrt(norm)
            return x * norm

    g_a = nn.Sequential(
        nn.Conv2d(3, N, 5, 2, 2), TorchGDN(N),
        nn.Conv2d(N, N, 5, 2, 2), TorchGDN(N),
        nn.Conv2d(N, N, 5, 2, 2), TorchGDN(N),
        nn.Conv2d(N, M, 5, 2, 2),
    )
    g_s = nn.Sequential(
        nn.ConvTranspose2d(M, N, 5, 2, 2, 1), TorchGDN(N, inverse=True),
        nn.ConvTranspose2d(N, N, 5, 2, 2, 1), TorchGDN(N, inverse=True),
        nn.ConvTranspose2d(N, N, 5, 2, 2, 1), TorchGDN(N, inverse=True),
        nn.ConvTranspose2d(N, 3, 5, 2, 2, 1),
    )
    return g_a, g_s


class TestTorchImportParity:
    def test_factorized_transforms_match_torch(self, rng):
        """Import a synthetic torch checkpoint and verify g_a/g_s outputs
        match the torch oracle to float tolerance."""
        N, M = 8, 12
        torch.manual_seed(0)
        g_a, g_s = _torch_factorized(N, M)

        # synthetic state dict with reference key naming
        sd = {}
        for i, layer in enumerate(g_a):
            if hasattr(layer, "weight") and isinstance(layer, torch.nn.Conv2d):
                sd[f"g_a.{i}.weight"] = layer.weight.data
                sd[f"g_a.{i}.bias"] = layer.bias.data
            else:
                sd[f"g_a.{i}.beta"] = layer.beta.data
                sd[f"g_a.{i}.gamma"] = layer.gamma.data
        for i, layer in enumerate(g_s):
            if isinstance(layer, torch.nn.ConvTranspose2d):
                sd[f"g_s.{i}.weight"] = layer.weight.data
                sd[f"g_s.{i}.bias"] = layer.bias.data
            else:
                sd[f"g_s.{i}.beta"] = layer.beta.data
                sd[f"g_s.{i}.gamma"] = layer.gamma.data

        # EB params from a freshly-initialized flax model (copied into sd so
        # the importer sees a complete checkpoint)
        from compressai_environment_tpu.models import FactorizedPrior

        m = FactorizedPrior(N, M).init(input_shape=(1, 32, 32, 3))
        for k, v in m.params["entropy_bottleneck"].items():
            sd[f"entropy_bottleneck.{k}"] = np.asarray(v)

        load_state_dict(m, sd)

        x = rng.random((1, 32, 32, 3), dtype=np.float32)
        y = np.asarray(
            m.net.apply(
                {"params": m.params}, jnp.asarray(x), method=FactorizedPriorNet.encode
            )
        )
        with torch.no_grad():
            yt = g_a(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(y, yt.transpose(0, 2, 3, 1), atol=1e-4)

        xr = np.asarray(
            m.net.apply(
                {"params": m.params}, jnp.asarray(y), method=FactorizedPriorNet.decode
            )
        )
        with torch.no_grad():
            xrt = g_s(torch.from_numpy(yt)).clamp_(0, 1).numpy()
        np.testing.assert_allclose(xr, xrt.transpose(0, 2, 3, 1), atol=1e-4)
