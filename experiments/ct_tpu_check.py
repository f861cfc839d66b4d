"""Run the REAL bucket_contact_table on the current backend and print
slot-exact aggregates. Run once with JAX_PLATFORMS=cpu (interpret mode)
and once on TPU; the printed numbers must match (compaction order is
deterministic row-major, so even per-slot checksums agree)."""

import numpy as onp
import jax
import jax.numpy as jnp

from physics_tpu.config import SimConfig
from physics_tpu.io.meshes import box_inertia
from physics_tpu.scene import SceneBuilder


def main():
    from physics_tpu.ops.broadphase import (
        body_aabbs, pair_candidates, sweep_order,
    )
    from physics_tpu.ops.contact_table import (
        CT_ACT, CT_D, CT_RA, bucket_contact_table, table_keys_scalar,
    )

    rng = onp.random.default_rng(3)
    b = SceneBuilder()
    for k in range(24):
        base = onp.array([(k % 4) * 8.0, 0.5, 0.0])
        i = b.add_body(pos=base + rng.uniform(-0.6, 0.6, 3),
                       inertia=box_inertia((0.5,) * 3, 1.0))
        b.set_box(i, (0.5,) * 3, friction=0.5)
    state = b.build()
    cfg = SimConfig(
        ground_plane=True, pair_collisions=True, boxes_only=True,
        broadphase="sweep", sweep_window=12, pair_buckets=True,
        bucket_block=128, contact_solver="pallas_banded",
        contact_table=True, contact_iters=8, max_contacts=512,
    )
    order = sweep_order(state, body_aabbs(state))
    cand = pair_candidates(state, cfg)
    table, meta, _ = bucket_contact_table(state, cand, cfg, order)
    table.block_until_ready()
    keys = table_keys_scalar(table, state.num_bodies, 8, 8)
    act = table[CT_ACT] > 0
    print("backend:", jax.default_backend())
    print("active:", int(jnp.sum(act.astype(jnp.int32))))
    print("depth_sum: %.6f" % float(jnp.sum(table[CT_D])))
    print("key_sum:", int(jnp.sum(keys.astype(jnp.int64))
                          if jax.config.jax_enable_x64
                          else jnp.sum(keys)))
    print("ra_sum:", int(jnp.sum(table[CT_RA])))
    print("slot_checksum: %.6f" % float(jnp.sum(
        table * (1.0 + 0.001 * jnp.arange(table.shape[1],
                                          dtype=jnp.float32)))))


if __name__ == "__main__":
    main()
