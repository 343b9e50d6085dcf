"""utils.misc timing-barrier helpers.

sync_fetch is the completion barrier behind every timing and profiler-trace
boundary (the remote axon runtime returns early from block_until_ready —
see its docstring); it must drain EVERY device a value is sharded over, not
just the shard owning element 0.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spgan_tpu.utils.misc import sync_fetch


def test_sync_fetch_single_device():
    x = jnp.arange(12.0).reshape(3, 4)
    assert sync_fetch(x) == 0.0
    assert sync_fetch({"a": x + 5, "b": x}) == 5.0


def test_sync_fetch_numpy_leaf():
    assert sync_fetch(np.full((2, 2), 7.0)) == 7.0
    assert sync_fetch([np.float32(3.0)]) == 3.0


def test_sync_fetch_sharded_covers_all_shards():
    """A width-sharded value (the sharded-engine meta image layout) must
    trigger one fetch per device shard — regression for the single-element
    fetch that only bounded device 0's queue."""
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("data",))
    x = jnp.arange(8.0 * 16).reshape(8, 16)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    assert len(xs.addressable_shards) == len(devs)
    assert sync_fetch(xs) == float(xs.addressable_shards[-1].data[0, 0])
