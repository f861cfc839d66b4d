"""Prebuilt benchmark/test scenes for the BASELINE.json configs."""

from __future__ import annotations

import numpy as np

from physics_tpu.config import SimConfig
from physics_tpu.io.meshes import box_inertia, sphere_inertia
from physics_tpu.scene import SceneBuilder
from physics_tpu.state import SimState


def box_stack(n_boxes: int = 10, half: float = 0.5) -> SimState:
    """BASELINE config: vertical box stack (resting-contact stability)."""
    b = SceneBuilder()
    for k in range(n_boxes):
        i = b.add_body(
            pos=(0.0, half + 2 * half * k + 0.001 * k, 0.0),
            inertia=box_inertia((half,) * 3, 1.0),
        )
        b.set_box(i, (half,) * 3, friction=0.6)
    return b.build()


def box_pile(
    n_bodies: int = 4096,
    half: float = 0.5,
    seed: int = 0,
    layers: int = 4,
    x_aspect: float = 16.0,
) -> SimState:
    """BASELINE config: N-body box pile dropped above the ground plane.

    Laid out as a long trench (x-extent ≫ z-extent) so the sort-by-x sweep
    broad phase keeps a low per-window density; this is the scene-design
    analogue of choosing a good sharding layout.
    """
    rng = np.random.default_rng(seed)
    per_layer = n_bodies // layers
    nz = max(int(np.sqrt(per_layer / x_aspect)), 1)
    nx = per_layer // nz
    spacing = 2.6 * half

    b = SceneBuilder()
    count = 0
    layer = 0
    while count < n_bodies:
        k = count - layer * nx * nz
        if k >= nx * nz:
            layer += 1
            k = 0
        ix, iz = k % nx, k // nx
        jitter = rng.uniform(-0.3 * half, 0.3 * half, 3)
        pos = (
            ix * spacing + jitter[0],
            half + layer * 2.2 * half + 0.01 * layer + abs(jitter[1]),
            iz * spacing + jitter[2],
        )
        i = b.add_body(
            pos=pos,
            euler=rng.uniform(-0.2, 0.2, 3),
            inertia=box_inertia((half,) * 3, 1.0),
        )
        b.set_box(i, (half,) * 3, friction=0.5)
        count += 1
    return b.build()


def pile_config(n_bodies: int, dt: float = 1.0 / 60.0) -> SimConfig:
    """Tuned solver/broad-phase capacities for the pile scenes.

    This IS the production pile pipeline: fused contact table + banded
    Pallas solve + anchored rebuild. Experiments that want the XLA
    jacobi path for A/Bs must set contact_solver="jacobi" AND
    contact_rebuild=1 explicitly (the anchored rebuild requires the
    table path)."""
    return SimConfig(
        compat=False,
        ground_plane=True,
        pair_collisions=True,
        boxes_only=True,
        contact_solver="pallas_banded",
        broadphase="sweep",
        sweep_window=48,   # measured: overflow-free on the settled pile (32 overflows)
        max_pair_candidates=8 * n_bodies,
        # rank-block buckets: per-64-rank candidate compaction (cap 512 at
        # the 8·N budget) — bounds every banded-kernel tile's rank span by
        # construction and enables the Pallas narrow phase (default-on)
        pair_buckets=True,
        # fused bucket-aligned contact table (ops/contact_table.py):
        # SAT + ground + per-bucket compaction in ONE kernel, static
        # solver tile bases. Measured on the 4k pile (v5e trace):
        # 1.45 ms/step vs 1.59 for the two-kernel pipeline, overflow-free
        # through drop+settle (experiments/table_bench.py).
        contact_table=True,
        bucket_block=128,
        # two-phase narrow phase: face-axis prefilter compacts the 1024
        # AABB-overlap candidates per bucket to the ~true-overlap set
        # before the full manifold/emit/compaction (whose cost scales
        # with candidate lanes); 384 ≈ 1.5x the settled pile's per-bucket
        # true-overlap max — measured on the 4k pile drop+settle: same
        # contact set/penetration as 512, pair_overflow unchanged, trace
        # 1.056 → 0.995 ms/step (/tmp/fa2.log, round 3)
        bucket_cap2=384,
        # single-pass bf16 z movement in the solve kernel: solve trace
        # 0.361 → 0.252 ms on the settled 4k pile with the SAME
        # penetration/overflow envelope as exact movement (/tmp/fa4.log,
        # round 3; parity: tests/test_contacts_pallas.py z_bf16 test)
        z_bf16=True,
        # merged prep + in-kernel integration: measured neutral-to-
        # slightly-better with better penetration (round 4 A/B), and
        # required by the anchored rebuild below
        fuse_prep=True,
        fuse_integrate=True,
        # persistent anchored contacts: broad phase + table kernel every
        # 4th step; between rebuilds the solve kernel re-derives contact
        # geometry exactly from body-frame anchors (tests/test_rebuild.py)
        # — only DISCOVERY of new contacts waits ≤ 3 steps. The motion
        # gate is off for THIS scene on measurement: the trench
        # avalanches perpetually (max |v| 2–7 m/s), so the round-5
        # per-bucket displacement gate fires essentially every bucket
        # every step (measured 3.48M gated vs 8.7M ungated on v5e —
        # all-moving scenes degenerate the gate to per-step rebuilds),
        # and the 240-step max-penetration envelope is identical with
        # and without the delay (K=4: 0.510 vs K=1: 0.525 on v5e; K=8
        # rejected at 0.977 — experiments/rebuild_bench.py, round 4).
        # 3.84 → 6.08M body-steps/s. Scenes with HETEROGENEOUS motion
        # (settled bulk + ballistic intruders, packed envs) should set
        # contact_rebuild_vel_factor > 0: the gate then recomputes only
        # moving buckets' contacts per step (discovery within 1 step)
        # while settled regions ride the cheap refresh — see
        # bench.bench_batched_envs (11.3M at gated K=32) and
        # tests/test_rebuild.py::test_gated_refresh_mixed_scene.
        contact_rebuild=4,
        contact_rebuild_vel_factor=0.0,
        # refresh steps re-converge the slot-exact warm start in 4
        # sweeps (vel AND split-impulse pos — the kernel grid is
        # max(vel, pos) + 1): 6.08 → 7.25M body-steps/s at the same
        # envelope/overflow; 3 sweeps starts overflowing the table
        # (16 drops), 2 degrades the envelope to 0.64 — rejected
        # (experiments/rebuild_bench.py RIT=…, round 4)
        contact_refresh_iters=4,
        max_contacts_per_pair=4,
        max_contacts=6 * n_bodies,
        contact_iters=16,
        # banded-solver window for this scene: measured max tile span 288
        # on the settled 4k pile; 384 ran the full drop+settle cycle with
        # band_overflow = 0 and is ~5% faster than the 512 default. The
        # overflow counter guards regressions (metrics, never silent).
        pallas_window=384,
        dt=dt,
    )


def cube_drop(height: float = 2.0, size: float = 0.5,
              real_assets: bool | None = None) -> SimState:
    """BASELINE config 1: a single cube.obj hull dropped onto the ground
    plane under gravity (distinct from the reference's swinging-cube demo
    scene, which is jointed and has no ground — reference src/lib.rs:20-42
    has no collision at all; this is the new-capability drop config).

    The hull and inertia come from the real reference res/cube.obj when
    the asset directory resolves (io/assets.py), mirroring how the
    reference derives its render mesh from that file
    (src/resources.rs:32-120); otherwise the procedural bevel-cube stands
    in. `size` scales the file's ±1 extent."""
    from physics_tpu.io.primitives import beveled_cube_mesh

    asset = None
    if real_assets is not False:
        try:
            from physics_tpu.io.assets import load_cube_asset

            asset = load_cube_asset()
        except FileNotFoundError:
            if real_assets:
                raise
    if asset is not None:
        verts = asset.collision_verts * size
        inertia = asset.inertia * size**2
    else:
        verts, _ = beveled_cube_mesh(size=size, bevel=0.1 * size / 0.5)
        inertia = box_inertia((size,) * 3, 1.0)
    b = SceneBuilder()
    hull = b.add_hull(verts)
    i = b.add_body(pos=(0.0, height, 0.0), euler=(0.4, 0.2, 0.1),
                   inertia=inertia)
    b.set_hull(i, hull, friction=0.5, restitution=0.05)
    return b.build()


def drop_config(dt: float = 1.0 / 120.0) -> SimConfig:
    """Solver config for the single-hull drop (BASELINE config 1)."""
    return SimConfig(
        compat=False, ground_plane=True, pair_collisions=True,
        contact_iters=16, dt=dt,
    )


def sphere_rain(n_bodies: int = 256, seed: int = 0) -> SimState:
    """Mixed-size spheres raining onto the ground."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    for k in range(n_bodies):
        r = float(rng.uniform(0.2, 0.5))
        i = b.add_body(
            pos=(rng.uniform(-10, 10), 2 + 0.1 * k, rng.uniform(-10, 10)),
            inertia=sphere_inertia(r, 1.0),
        )
        b.set_sphere(i, r, friction=0.4, restitution=0.2)
    return b.build()


def random_env(seed: int, n_bodies: int = 8) -> SimState:
    """One randomized small scene (the 4096-batched-envs config unit)."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    for _ in range(n_bodies):
        i = b.add_body(
            pos=rng.uniform([-3, 1, -3], [3, 6, 3]),
            euler=rng.uniform(-1, 1, 3),
            inertia=box_inertia((0.4,) * 3, 1.0),
        )
        b.set_box(i, (0.4,) * 3, friction=0.5)
    return b.build()


def mesh_rain(n_bodies: int = 128, seed: int = 0, size: float = 0.5,
              bevel: float = 0.1, real_assets: bool | None = None
              ) -> SimState:
    """Convex-hull meshes raining onto the ground (the mesh-rain config,
    SURVEY.md §7 M2): every body is the reference demo's bevel-edged cube
    as a convex hull, randomly oriented, falling from a column.

    real_assets: derive the hull + inertia from the actual reference
    res/cube.obj (reference src/resources.rs:32-120) scaled to `size`,
    instead of the procedural bevel approximation. None = auto (use the
    real files when the asset directory resolves, else procedural).
    """
    from physics_tpu.io.primitives import beveled_cube_mesh

    asset = None
    if real_assets is not False:
        try:
            from physics_tpu.io.assets import load_cube_asset

            asset = load_cube_asset()
        except FileNotFoundError:
            if real_assets:
                raise

    rng = np.random.default_rng(seed)
    if asset is not None:
        verts = asset.collision_verts * size          # file cube spans ±1
        inertia = asset.inertia * size**2             # I ∝ m·L² at fixed m
    else:
        verts, _ = beveled_cube_mesh(size=size, bevel=bevel)
        inertia = box_inertia((size,) * 3, 1.0)
    b = SceneBuilder()
    hull = b.add_hull(verts)
    side = max(1, int(np.ceil(np.sqrt(n_bodies / 4))))
    count = 0
    for layer in range(10**9):
        if count >= n_bodies:
            break
        for gx in range(side):
            for gz in range(side):
                if count >= n_bodies:
                    break
                jitter = rng.uniform(-0.2, 0.2, 3)
                i = b.add_body(
                    pos=(
                        (gx - side / 2) * 2.5 * size + jitter[0],
                        1.5 * size + layer * 3.0 * size + jitter[1],
                        (gz - side / 2) * 2.5 * size + jitter[2],
                    ),
                    euler=rng.uniform(-1.5, 1.5, 3),
                    inertia=inertia,
                )
                b.set_hull(i, hull, friction=0.4, restitution=0.05)
                count += 1
    return b.build()


def mesh_rain_mixed(n_bodies: int = 128, seed: int = 0, size: float = 0.5,
                    real_assets: bool | None = None,
                    n_types: int = 2) -> SimState:
    """Multi-hull-type rain: bodies cycle through `n_types` distinct hull
    shapes (bevel cube, octahedron, and at n_types=3 a wedge prism)
    falling onto the ground — the multi-hull-type fast-path
    benchmark/test scene (type-pair-segmented candidates through the
    linear-SAT coefficient matmuls, ops/narrowphase.hull_obb_prefilter).
    n_types ≤ MAX_TABLE_HULL_TYPES scenes also ride the fused hull
    contact table (ops/hull_table.py, one sided SAT pass per ordered
    type pair)."""
    from physics_tpu.io.primitives import beveled_cube_mesh

    asset = None
    if real_assets is not False:
        try:
            from physics_tpu.io.assets import load_cube_asset

            asset = load_cube_asset()
        except FileNotFoundError:
            if real_assets:
                raise

    rng = np.random.default_rng(seed)
    if asset is not None:
        cube_verts = asset.collision_verts * size
        cube_inertia = asset.inertia * size**2
    else:
        cube_verts, _ = beveled_cube_mesh(size=size, bevel=0.1 * size / 0.5)
        cube_inertia = box_inertia((size,) * 3, 1.0)
    s = 1.3 * size
    octa_verts = np.array(
        [[s, 0, 0], [-s, 0, 0], [0, s, 0], [0, -s, 0],
         [0, 0, s], [0, 0, -s]], np.float32)
    octa_inertia = sphere_inertia(0.7 * s, 1.0)
    # third type (n_types=3): a wedge prism — 6 verts, 5 faces, a face
    # structure distinct from both the cube (quads + bevels) and the
    # octahedron (triangles only)
    wedge_verts = np.array(
        [[s, -0.5 * s, 0.8 * s], [s, -0.5 * s, -0.8 * s],
         [-s, -0.5 * s, 0.8 * s], [-s, -0.5 * s, -0.8 * s],
         [s, 0.7 * s, 0.0], [-s, 0.7 * s, 0.0]], np.float32)
    wedge_inertia = box_inertia((s, 0.6 * s, 0.8 * s), 1.0)
    if not 2 <= n_types <= 3:
        raise ValueError(f"mesh_rain_mixed supports 2-3 types, got {n_types}")

    b = SceneBuilder()
    cube = b.add_hull(cube_verts)
    octa = b.add_hull(octa_verts)
    hull_ids = [cube, octa]
    inertias = [cube_inertia, octa_inertia]
    if n_types >= 3:
        hull_ids.append(b.add_hull(wedge_verts))
        inertias.append(wedge_inertia)
    side = max(1, int(np.ceil(np.sqrt(n_bodies / 4))))
    count = 0
    for layer in range(10**9):
        if count >= n_bodies:
            break
        for gx in range(side):
            for gz in range(side):
                if count >= n_bodies:
                    break
                jitter = rng.uniform(-0.2, 0.2, 3)
                t = count % n_types
                i = b.add_body(
                    pos=(
                        (gx - side / 2) * 2.5 * size + jitter[0],
                        1.5 * size + layer * 3.0 * size + jitter[1],
                        (gz - side / 2) * 2.5 * size + jitter[2],
                    ),
                    euler=rng.uniform(-1.5, 1.5, 3),
                    inertia=inertias[t],
                )
                b.set_hull(i, hull_ids[t],
                           friction=0.4, restitution=0.05)
                count += 1
    return b.build()


def rain_config(n_bodies: int, dt: float = 1.0 / 60.0) -> SimConfig:
    """Solver/broad-phase settings for the mesh-rain hull scenes.

    hulls_only skips the box-SAT/sphere/vertex-face candidate generation
    (half the narrow-phase device time at 128 hulls, measured)."""
    return SimConfig(
        compat=False,
        ground_plane=True,
        pair_collisions=True,
        hulls_only=True,
        broadphase="sweep",
        sweep_window=32,
        # 12N candidate caps: measured on TPU (rain_ab A/B). The square
        # rain column is denser per x-slice than the trench pile, so the
        # bucketed sweep drops ~1k AABB candidates per step at the
        # settled 1024 scene (pair_overflow ~990, counted never silent);
        # window 64 finds ~2.4k more contacts but pushes the per-bucket
        # candidate cap harder (overflow 1412) at the same wall time —
        # kept at 32 (round 5 A/B, experiments/rain_bench.py RAIN_SW)
        max_pair_candidates=12 * n_bodies,
        # two-phase narrow phase: OBB face-SAT prefilter compacts the 8N
        # AABB candidates to the ~true-overlap set (≈3/body settled)
        # before the full hull-SAT support matmuls; overflow-counted
        # (metrics prefilter_overflow, watch it through drop+settle)
        hull_prefilter_cap=4 * n_bodies,
        # 4 manifold points per pair (same as the box pile): the top-k
        # slot-selection epilogue is ~kk [P]-row argmax/select passes,
        # and 4-point face manifolds are the standard stable-stacking
        # budget; measured stable on the hull stack/drop tests
        max_contacts_per_pair=4,
        # 16N contact caps: the K=4 anchored rebuild discovers contact
        # bursts in batches, which transiently overflowed the 12N table
        # during the drop (77 dropped); 16N runs the full 360-step
        # drop+settle overflow-free at ~9% throughput cost (round 5,
        # /tmp/rainenv A/B on v5e)
        max_contacts=16 * n_bodies,
        # fused HULL contact table (ops/hull_table.py): SAT + ground +
        # compaction + warm match in ONE kernel, feeding the fused
        # banded solve with merged prep + in-kernel integration.
        # Round-5 adoption A/B (experiments/rain_bench.py, v5e):
        # 1024-rain 0.955 -> 2.04M body-steps/s, 128-rain 0.39 -> 0.80M
        contact_solver="pallas_banded",
        pair_buckets=True,
        bucket_block=128,
        contact_table=True,
        hull_table=True,
        bucket_cap2=512,
        fuse_prep=True,
        fuse_integrate=True,
        # persistent anchored hull contacts: the hull table kernel (80%
        # of the step at 1024, 803 of 1015 us) runs every 4th step;
        # between rebuilds the solve kernel re-derives geometry from
        # body-frame anchors. Guard OFF on measurement, mirroring the
        # pile: rain keeps tumbling bodies at 2-4 m/s long after the
        # floor settles, so the global max|v| guard refuses the refresh
        # path forever (guard-on measured 0.815M vs 2.04M); the
        # 360-step drop+settle envelope is K=4: 1.114 vs K=1: 1.089 max
        # penetration with zero contact overflow at the 16N caps.
        contact_rebuild=4,
        contact_rebuild_vel_factor=0.0,
        contact_refresh_iters=4,
        contact_iters=8,
        # bf16 z-movement in the banded sweeps (f32 accumulation):
        # measured +8% on 1024-rain, parity within solver tolerance
        z_bf16=True,
        dt=dt,
    )


def rain_xla_config(n_bodies: int, dt: float = 1.0 / 60.0) -> SimConfig:
    """The pre-adoption generic-path rain config: XLA shared-hull fast
    paths (slot-major SAT contractions + OBB prefilter) feeding the
    banded solve, no fused table/anchoring. Kept as the parity/A-B
    partner for the production hull-table pipeline (rain_config) — the
    table tests assert the two produce the same contact sets."""
    return rain_config(n_bodies, dt).replace(
        pair_buckets=False, bucket_block=64, bucket_cap2=0,
        contact_table=False, hull_table=False,
        fuse_prep=False, fuse_integrate=False,
        contact_rebuild=1, contact_refresh_iters=0,
    )
