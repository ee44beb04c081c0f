"""parallel/: data mesh sharding + multi-host eval merge helpers.

Runs on the 8-virtual-device CPU mesh from conftest — coverage the CUDA
reference could never have (its DDP needs real GPUs, SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgsfusion_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from hgsfusion_tpu.parallel.multihost import (
    merge_detections_across_hosts,
    shard_indices_for_host,
)


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == len(jax.devices()) == 8
        assert mesh.axis_names == ("data",)

    def test_make_mesh_subset(self):
        mesh = make_mesh(n_devices=4)
        assert mesh.devices.size == 4

    def test_shard_batch_places_leading_dim(self):
        mesh = make_mesh()
        batch = {
            "points": np.zeros((8, 16, 4), np.float32),
            "frame_id": ["a"] * 8,  # metadata lists pass through
            "scalar": np.float32(3.0),
        }
        out = shard_batch(batch, mesh)
        sh = out["points"].sharding
        assert sh.is_equivalent_to(batch_sharding(mesh), ndim=3)
        # each device holds 1/8 of the batch
        assert out["points"].addressable_shards[0].data.shape == (1, 16, 4)
        assert out["frame_id"] == ["a"] * 8

    def test_psum_over_sharded_batch(self):
        """Gradient-style all-reduce: a jitted global-array sum over the
        sharded batch equals the host-side sum (the DDP allreduce
        equivalent under jit)."""
        mesh = make_mesh()
        x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
        xs = jax.device_put(x, batch_sharding(mesh))

        @jax.jit
        def global_mean(v):
            return jnp.mean(v)

        assert float(global_mean(xs)) == pytest.approx(float(x.mean()))

    def test_replicated_spec(self):
        mesh = make_mesh()
        p = jax.device_put(np.ones((3, 3), np.float32), replicated(mesh))
        assert p.addressable_shards[0].data.shape == (3, 3)
        assert len(p.addressable_shards) == 8


class TestMultihost:
    def test_single_host_merge_is_noop(self):
        out = {"boxes": np.zeros((2, 5, 7)), "valid": np.ones((2, 5), bool)}
        merged = merge_detections_across_hosts(out)
        assert merged is out

    def test_shard_indices_cover_all_frames(self):
        # single-host: this host gets everything
        assert shard_indices_for_host(10) == list(range(10))


class TestHybridMesh:
    def test_mesh_2d_shape_and_axes(self):
        from hgsfusion_tpu.parallel.mesh import make_mesh_2d

        mesh = make_mesh_2d(4, 2)
        assert mesh.axis_names == ("data", "spatial")
        assert mesh.devices.shape == (4, 2)
        with pytest.raises(ValueError):
            make_mesh_2d(8, 2)  # 16 > 8 virtual devices

    def test_spatially_sharded_conv_matches_replicated(self):
        """GSPMD halo exchange: a 3x3 conv over row-sharded images must be
        bit-identical to the unsharded computation."""
        import flax.linen as nn
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hgsfusion_tpu.parallel.mesh import (
            make_mesh_2d, spatial_batch_sharding,
        )

        conv = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)))
        x = np.random.RandomState(0).rand(2, 16, 12, 3).astype(np.float32)
        var = conv.init(jax.random.PRNGKey(0), x)
        want = np.asarray(conv.apply(var, x))

        mesh = make_mesh_2d(2, 4)
        xs = jax.device_put(
            x, spatial_batch_sharding(mesh, x.ndim))  # (data, spatial) rows
        var_r = jax.device_put(var, NamedSharding(mesh, P()))
        with mesh:
            got = np.asarray(jax.jit(conv.apply)(var_r, xs))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_shard_indices_equal_length_and_cover():
    """DistributedSampler semantics: wrap-padded strided shards of EQUAL
    length per host (collectives would hang on uneven shards); the union
    covers every frame and zip-interleave + truncate restores frame
    order."""
    from hgsfusion_tpu.parallel.multihost import shard_indices_for_host

    # single-process runtime: exercise the static math via process=...
    import jax

    n_proc = jax.process_count()
    assert shard_indices_for_host(10, process=0) == list(
        range(0, 10, n_proc))
    # simulated multi-host layout check (pure arithmetic)
    num_frames, n = 10, 4
    per = (num_frames + n - 1) // n
    padded = list(range(num_frames)) + list(range(per * n - num_frames))
    shards = [padded[p::n] for p in range(n)]
    assert all(len(s) == per for s in shards)
    merged = [x for tup in zip(*shards) for x in tup][:num_frames]
    assert merged == list(range(num_frames))


def test_shard_indices_fewer_frames_than_hosts(monkeypatch):
    """num_frames < process_count (e.g. a --max_frames smoke run on many
    hosts) must still yield EQUAL, non-empty shards via whole-list repetition
    (torch DistributedSampler repeats indices * ceil(pad/len)); a single
    slice-pad under-fills and the zip-merge then drops frames (ADVICE r2)."""
    import jax

    from hgsfusion_tpu.parallel.multihost import shard_indices_for_host

    monkeypatch.setattr(jax, "process_count", lambda: 8)
    num_frames = 3
    shards = [shard_indices_for_host(num_frames, process=p) for p in range(8)]
    assert all(len(s) == 1 for s in shards)  # per = ceil(3/8) = 1
    merged = [x for tup in zip(*shards) for x in tup][:num_frames]
    assert merged == list(range(num_frames))
    # and the classic case is unchanged
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    shards = [shard_indices_for_host(10, process=p) for p in range(4)]
    assert all(len(s) == 3 for s in shards)
    merged = [x for tup in zip(*shards) for x in tup][:10]
    assert merged == list(range(10))


def test_shard_indices_zero_frames(monkeypatch):
    """num_frames == 0 (empty dataset / --max_frames 0) yields empty shards
    on every host instead of a ZeroDivisionError in the wrap-padding."""
    import jax

    from hgsfusion_tpu.parallel.multihost import shard_indices_for_host

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert all(shard_indices_for_host(0, process=p) == [] for p in range(4))
