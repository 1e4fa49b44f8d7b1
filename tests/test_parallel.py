"""Sharding tests on the virtual 8-device CPU mesh: shard-invariance of the
multi-channel imaging step (the multi-node coverage the reference lacks,
SURVEY.md §4.9)."""

import jax
import numpy as np
import pytest

from katsdpimager_tpu.parallel import (
    MultiChannelConfig, make_example_batch, make_imaging_step, make_mesh,
)
from katsdpimager_tpu.parallel.multichannel import single_channel_step


def small_cfg(minor=0):
    return MultiChannelConfig(
        pixels=64, num_pols=1, kernel_width=8, oversample=4, w_planes=2,
        w_slices=2, vis_per_slice=64, minor_cycles=minor, patch=17,
        loop_gain=0.2)


class TestShardInvariance:
    @pytest.mark.parametrize("vis_shards", [1, 2, 4])
    def test_dirty_invariant(self, vis_shards):
        """The residual image must not depend on the mesh factorization."""
        cfg = small_cfg()
        C = 8 // vis_shards  # one channel per chan-shard
        batch = make_example_batch(cfg, C)

        # Unsharded oracle
        fn = single_channel_step(cfg)
        expected = []
        for c in range(C):
            res, _ = fn(batch.kernel[c], batch.taper1d[c],
                        batch.pixel_size[c], batch.mid_w[c], batch.uv[c],
                        batch.sub_uv[c], batch.w_plane[c], batch.weights[c],
                        batch.vis[c])
            expected.append(np.asarray(res))
        expected = np.stack(expected)

        mesh = make_mesh(vis_shards=vis_shards)
        step = make_imaging_step(mesh, cfg)
        residual, _model = step(batch)
        # f32 summation order differs between shard factorizations; bound
        # the error relative to the image scale (structural sharding bugs
        # produce O(1) errors, reassociation noise is ~1e-3).
        scale = np.abs(expected).max()
        np.testing.assert_allclose(np.asarray(residual), expected,
                                   rtol=0.02, atol=5e-3 * scale)

    def test_with_clean(self):
        """CLEAN minor cycles run inside the sharded step."""
        cfg = small_cfg(minor=5)
        batch = make_example_batch(cfg, 4)
        mesh = make_mesh(vis_shards=2)
        step = make_imaging_step(mesh, cfg)
        residual, model = step(batch)
        assert residual.shape == (4, 1, 64, 64)
        # CLEAN must have moved some flux into the model
        assert float(np.abs(np.asarray(model)).sum()) > 0

    def test_devices_available(self):
        assert jax.device_count() >= 8
