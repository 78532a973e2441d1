"""idg-bench CLI: the TPU analogue of the reference's per-kernel executables.

The reference builds one executable per kernel (tests/CMakeLists.txt:4-38);
each runs performance mode with no args or correctness mode with `-c`
(tests/gridder_common.cpp:126-140). Here one CLI selects workload/version/
mode, honors the same env vars, and adds sweep / list / scaling commands
(replacing scripts/run_perf_cuda.sh and extending to multi-chip).

  python -m idg_tpu.cli run --workload gridder --version xla_v4 --mode perf
  python -m idg_tpu.cli run --workload degridder --version xla_v2 --mode check
  python -m idg_tpu.cli sweep --mode perf
  python -m idg_tpu.cli vadd
  python -m idg_tpu.cli list
  python -m idg_tpu.cli info
"""

from __future__ import annotations

import argparse
import os
import sys

# First TPU compiles on this platform take minutes; cache across processes.

CSV_EXT = "-tpu.csv"


def _honor_platform_env() -> None:
    """Make JAX_PLATFORMS effective even when a site hook pre-registers a
    TPU platform (this machine's sitecustomize does): the env var alone can
    be overridden before our imports run, so force it via jax.config too.
    Also enables the persistent compilation cache (same env-vs-config
    issue — see config.setup_compilation_cache)."""
    from .config import setup_compilation_cache

    setup_compilation_cache()
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


def _perf_one(workload: str, version: str, mesh_size: int | None,
              w_rank: int | None = None, params=None,
              name_suffix: str = "", w_obs: bool = False,
              sustain_s: float | None = None) -> float:
    """Performance mode (p_run_gridder_ semantics, app/CUDA/util.cpp:172-249).

    Returns the min-of-windows seconds per launch (see utils/timing.py:
    NR_WINDOWS timed windows; min is the headline, mean/std in the CSV).

    The version/w_rank are resolved through the API guards here, ONCE, so
    the report/CSV name always reflects the kernel actually timed: if the
    guards substitute a fallback (recurrence on non-uniform channels,
    fixed-rank rung on w!=0 data) the name carries the resolved version
    plus a ``_fb`` marker instead of silently mislabeling the result.
    """
    import jax

    from .config import HarnessConfig, IDGParams
    from .data import initialize_subgrids, make_perf_observation
    from .ops.api import _resolve, staged_runner
    from .utils.costs import workload_costs
    from .utils.printing import print_device_info, print_parameters
    from .utils.report import device_name, report, report_csv
    from .utils.timing import time_kernel

    if params is None:
        params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    print_device_info()

    if w_obs:
        # w-realistic benchmark data: nonzero w tracks + w-plane metadata
        # (make_w_observation), so the rank-2 w·n Taylor work is real work
        from .data import make_w_observation

        params, obs, _ = make_w_observation(params)
        name_suffix = name_suffix + "_wobs"
    else:
        obs = make_perf_observation(params)
    print_parameters(params)
    subgrids = None
    if workload == "degridder":
        subgrids = initialize_subgrids(
            params.nr_subgrids, params.nr_correlations, params.subgrid_size
        )

    # Resolve once, host-side, with the global observation in hand — this
    # also guards the mesh path, whose sharded_* builders are guard-free
    # benchmark internals (parallel/sharded.py).
    rversion, rw_rank = _resolve(workload, version, params, obs, w_rank)

    if mesh_size:
        from .ops.pallas import STAGED
        from .parallel import make_mesh
        from .parallel.sharded import (
            shard_observation,
            shard_staged_inputs,
            sharded_degridder,
            sharded_degridder_staged,
            sharded_gridder,
            sharded_gridder_staged,
        )
        from .types import split_complex, split_observation

        mesh = make_mesh(mesh_size)
        if (workload, rversion) in STAGED:
            # launch-only timing, comparable to the single-chip staged
            # benchmarks: staging runs once, pre-sharded
            stg_sh, spair_sh = shard_staged_inputs(
                params, split_observation(obs), mesh, workload, rversion,
                subgrids,
            )
            if workload == "gridder":
                fn = sharded_gridder_staged(
                    params, mesh, rversion, w_rank=rw_rank, slim=True)
                args = (stg_sh,)
            else:
                fn = sharded_degridder_staged(
                    params, mesh, rversion, w_rank=rw_rank, slim=True)
                args = (stg_sh, spair_sh)
        elif workload == "gridder":
            sharded_sobs, s_pad = shard_observation(
                params, split_observation(obs), mesh)
            fn = sharded_gridder(params, mesh, rversion, w_rank=rw_rank)
            args = (sharded_sobs,)
        else:
            from .parallel.distributed import distribute_subgrid_pair

            sharded_sobs, s_pad = shard_observation(
                params, split_observation(obs), mesh)
            # pad/shard the subgrid pair to the observation's padded row
            # count (shard_map needs matching, mesh-divisible axes)
            spair = distribute_subgrid_pair(
                split_complex(subgrids), mesh, s_pad)
            fn = sharded_degridder(params, mesh, rversion, w_rank=rw_rank)
            args = (sharded_sobs, spair)
    else:
        fn, args = staged_runner(
            workload, rversion, params, obs, subgrids, w_rank=rw_rank
        )

    from .ops.pallas import STAGED as _STAGED

    if mesh_size and (workload, rversion) in _STAGED \
            and os.environ.get("IDG_STAGE_LAYOUT", "match").lower() == "match":
        # AOT input-format match for the mesh staged path, mirroring
        # staged_runner's 'match' policy: device_put the sharded staged
        # inputs into the compiled executable's own preferred layouts so
        # no per-launch relayout copies remain (the round-5 mesh-1 trace
        # showed ~6.4 ms/pass of {0,3,2,1}→{3,2,1,0} input copies on the
        # subgrid pair alone).
        try:
            compiled = fn.lower(*args).compile()
            in_fmt = compiled.input_formats[0]
            args = tuple(jax.device_put(a, f)
                         for a, f in zip(args, in_fmt))
            jax.block_until_ready(jax.tree_util.tree_leaves(args))
            fn = compiled
        except Exception as e:  # noqa: BLE001 — downgrade, but say so
            print(f"[idg-tpu] mesh staged: AOT layout-matched dispatch "
                  f"unavailable ({type(e).__name__}); plain jit")

    timing = time_kernel(fn, *args, harness=harness)
    gflops, gbytes, mvis = workload_costs(params)
    fb = "_fb" if rversion != version else ""
    mtag = f"_mesh{mesh_size}" if mesh_size else ""
    name = f"{workload}_{rversion}{fb}{mtag}{name_suffix}"
    dev = device_name()
    from .utils.roofline import roofline_fraction

    roofline = roofline_fraction(gflops / timing.seconds, gflops, gbytes, dev)
    extra = None
    if sustain_s:
        # sustained-launch window (the reference's ~10 s energy-loop
        # semantics, app/CUDA/util.cpp:131-155, minus the power read —
        # TPU power is not host-readable): reports the SUSTAINED
        # per-launch time and the intra-window drift, a thermal/queue
        # check on the min-of-windows headline above.
        from .utils.timing import time_kernel_sustained

        sus = time_kernel_sustained(fn, *args, duration_s=sustain_s,
                                    harness=harness)
        print(f"    sustained {sus.window_seconds:.1f}s window: "
              f"{sus.seconds*1e3:.2f} ms/launch over {sus.launches} "
              f"launches (min-of-windows {timing.seconds*1e3:.2f} ms, "
              f"drift {sus.drift_pct:+.1f}%)")
        extra = {
            "sustained_ms": sus.seconds * 1e3,
            "sustain_launches": sus.launches,
            "sustain_window_s": sus.window_seconds,
            "sustain_drift_pct": sus.drift_pct,
        }
    report(name, timing.seconds, gflops, gbytes, mvis, roofline=roofline,
           seconds_std=timing.seconds_std)
    report_csv(
        name, dev, CSV_EXT, timing.seconds, gflops, gbytes, mvis,
        output_path=harness.output_path, roofline=roofline,
        seconds_std=timing.seconds_std, extra=extra,
    )
    return timing.seconds


def _check_one(workload: str, version: str) -> bool:
    """Correctness mode (`-c` semantics, tests/gridder_common.cpp:43-124)."""
    from .config import IDGParams
    from .data import initialize_subgrids, make_observation
    from .models.reference import degridder_reference, gridder_reference
    from .ops.api import run_degridder, run_gridder
    from .utils.compare import compare_subgrids, compare_visibilities
    from .utils.printing import print_parameters

    params = IDGParams.correctness_defaults()
    print_parameters(params)
    obs, _ = make_observation(params)
    if workload == "gridder":
        print(">>> Run gridder on host (golden reference)")
        golden = gridder_reference(params, obs)
        print(f">>> Run gridder on device ({version})")
        got = run_gridder(params, obs, version=version)
        result = compare_subgrids(golden, got)
    else:
        subgrids = initialize_subgrids(
            params.nr_subgrids, params.nr_correlations, params.subgrid_size
        )
        print(">>> Run degridder on host (golden reference)")
        golden = degridder_reference(params, obs, subgrids)
        print(f">>> Run degridder on device ({version})")
        got = run_degridder(params, obs, subgrids, version=version)
        result = compare_visibilities(golden, got)
    return result.passed


def cmd_run(args) -> int:
    if args.mode == "perf":
        _perf_one(args.workload, args.version, args.mesh, args.w_rank,
                  w_obs=args.w_obs, name_suffix=args.suffix,
                  sustain_s=args.sustain)
        return 0
    if args.mesh:
        print("warning: --mesh is a perf-mode option; check mode validates "
              "the single-device kernel (the sharded paths are validated "
              "by tests/test_parallel.py on a virtual mesh)")
    ok = _check_one(args.workload, args.version)
    return 0 if ok else 1


def cmd_sweep(args) -> int:
    """Run all (or selected) versions of the chosen workloads — the
    run_perf_{cuda,hip}.sh analogue. `--stations N` shrinks the problem for
    ladder comparisons; `--fullsize` runs the reference perf defaults
    (S=24,500) and suffixes the CSV names with ``_fullsize``."""
    from .config import IDGParams
    from .ops.registry import list_kernels

    params = None
    suffix = ""
    if args.fullsize:
        params = IDGParams.from_env()
        suffix = "_fullsize"
    elif args.stations:
        params = IDGParams.from_env(nr_stations=args.stations)

    failed = []
    for workload in args.workloads.split(","):
        versions = (
            [e.version for e in list_kernels(workload)]
            if args.versions == "all"
            else args.versions.split(",")
        )
        for version in versions:
            print(f"=== {workload} {version} ({args.mode}) ===", flush=True)
            try:
                if args.mode == "perf":
                    _perf_one(workload, version, args.mesh, params=params,
                              name_suffix=suffix)
                elif not _check_one(workload, version):
                    failed.append((workload, version))
            except Exception as exc:  # keep sweeping, report at the end
                print(f"!!! {workload} {version} errored: {exc}")
                failed.append((workload, version))
    if failed:
        print("FAILED:", ", ".join(f"{w}/{v}" for w, v in failed))
        return 1
    return 0


def cmd_vadd(args) -> int:
    """Bandwidth smoke benchmark (res/vadd analogue)."""
    from .config import HarnessConfig
    from .ops.vadd import make_vadd_inputs, vadd, vadd_gbytes, vadd_pallas
    from .utils.printing import print_device_info
    from .utils.report import device_name, report, report_csv
    from .utils.timing import time_kernel

    import jax

    print_device_info()
    harness = HarnessConfig.from_env()
    x, y = make_vadd_inputs(args.n)
    x, y = jax.device_put(x), jax.device_put(y)
    if args.pallas:
        interpret = jax.devices()[0].platform != "tpu"
        fn = jax.jit(lambda a, b: vadd_pallas(a, b, interpret=interpret))
    else:
        fn = vadd
    timing = time_kernel(fn, x, y, harness=harness)
    gbytes = vadd_gbytes(args.n)
    name = "vadd_pallas" if args.pallas else "vadd"
    report(name, timing.seconds, 0.0, gbytes)
    report_csv(
        name, device_name(), CSV_EXT, timing.seconds, 0.0, gbytes,
        output_path=harness.output_path,
    )
    return 0


def cmd_grid(args) -> int:
    """Grid-stage benchmark: batched subgrid (i)FFT + subgrid↔grid
    scatter-add/gather (ops/grid.py — the north-star extension stage; the
    reference stops at subgrids, README.md:78-80)."""
    import jax

    from .config import HarnessConfig, IDGParams
    from .data import initialize_subgrids, make_perf_observation
    from .ops.grid import grid_to_subgrids, subgrids_to_grid
    from .types import split_complex
    from .utils.costs import grid_costs
    from .utils.printing import print_device_info, print_parameters
    from .utils.report import device_name, report, report_csv
    from .utils.roofline import roofline_fraction
    from .utils.timing import time_kernel

    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    print_device_info()
    print_parameters(params)
    obs = make_perf_observation(params)
    md = obs.metadata
    cx = jax.device_put(md.coord_x)
    cy = jax.device_put(md.coord_y)
    g = params.grid_size
    n = params.subgrid_size
    apply_fft = not args.no_fft

    if args.direction == "to-grid":
        sub = jax.device_put(split_complex(initialize_subgrids(
            params.nr_subgrids, params.nr_correlations, n
        )))
        method = args.method
        plan = None
        if method != "scatter":
            # bucketed paths: routing planned once on the host from the
            # (host-known) metadata coordinates; hot path is dense.
            from .ops.grid import plan_grid_add

            plan = plan_grid_add(md.coord_x, md.coord_y, g, n)
            print(f"grid-add plan: {plan.nby}x{plan.nbx} blocks, cap "
                  f"{plan.cap}, slot inflation {plan.slot_inflation:.2f}x")
            if method == "auto":
                # measured v5e/axon constants: the block-sorted range
                # kernel (static window DMAs, host sort is free on
                # metadata) wins whenever blocks are mostly occupied
                # (66.8 ms vs pallas 139 / scatter 333 at the default
                # problem); VMEM-resident piece scatter when the block
                # array fits scoped VMEM; the slot-gather kernel costs
                # ~5 us/grid-step (DMA-issue-bound) vs ~13.6 us/
                # scatter-window on sparse plans (gather 53.5 ms vs
                # scatter 102 ms at lofar4096; scatter wins at 16384^2)
                from .ops.grid import VMEM_GRID_LIMIT

                nbp = plan.slots.shape[0]
                d = params.nr_correlations * n * n
                gather_steps = nbp * max(-(-plan.cap // 8), 1)
                out_gb_pre = 2 * params.nr_correlations * g * g * 4 / 1e9
                # ranges for dense-ish plans, and ALWAYS for HBM-capacity
                # grids: the range kernel's empty-block fast path makes
                # sparse plans cheap, and the streamed-scatter alternative
                # measured 1126 ms vs 607 (pre-fast-path) at 16384²
                if (g % n == 0 and d % 1024 == 0
                        and (nbp <= 8 * params.nr_subgrids
                             or out_gb_pre > 5.0)):
                    method = "ranges"
                elif nbp * d * 4 <= VMEM_GRID_LIMIT:
                    method = "pallas"
                elif gather_steps * 5.0 < params.nr_subgrids * 13.6:
                    method = "pallas"
                else:
                    method = "scatter"
                print(f"grid-add auto -> {method}")
        # full split-pair output bytes; one fused pass also holds several
        # padded-plane temporaries, so past ~1/3 of a v5e's 16 GB HBM the
        # per-plane-jit formulation is the one that completes (16384²
        # full-pol OOMed fused: 8.6 GB output + transients)
        out_gb = 2 * params.nr_correlations * g * g * 4 / 1e9
        if method == "scatter" and out_gb > 5.0:
            from .ops.grid import subgrids_to_grid_streamed

            print(f"grid-add output {out_gb:.1f} GB -> streamed "
                  f"per-plane scatter")

            def fn(s, x, y):
                planes = subgrids_to_grid_streamed(s, x, y, g, apply_fft)
                # every plane is fully materialized and wrap-folded on
                # device; keep only a corner element each so the timing
                # loop doesn't pin two full near-HBM-sized outputs in
                # flight (the serialized device queue then frees plane k
                # right after its corner slice executes)
                return tuple(
                    tuple(plane[:1, :1] for plane in comp)
                    for comp in planes
                )
        elif method == "scatter":
            fn = jax.jit(
                lambda s, x, y: subgrids_to_grid(s, x, y, g, apply_fft)
            )
        elif method == "pallas":
            from .ops.grid import subgrids_to_grid_pallas

            fn = jax.jit(lambda s, x, y: subgrids_to_grid_pallas(
                s, x, y, g, apply_fft, plan=plan))
        elif method == "ranges":
            # block-sorted metadata path: sort once on the host (free —
            # coords are host data and the gridder is order-independent;
            # a production pipeline sorts at observation setup), then
            # every (quadrant, block) source set is one contiguous piece
            # range and the kernel is pure static-window DMA.
            import numpy as np

            from .ops.grid import (plan_grid_add_ranges,
                                   sorted_block_coords,
                                   subgrids_to_grid_ranges)

            order, cx_s, cy_s = sorted_block_coords(md.coord_x, md.coord_y,
                                                    g, n)
            rplan = plan_grid_add_ranges(cx_s, cy_s, g, n)
            print(f"grid-add range plan: {rplan.nby}x{rplan.nbx} blocks, "
                  f"window {rplan.w}")
            sub = tuple(jax.device_put(np.asarray(v)[order]) for v in sub)
            cx = jax.device_put(cx_s)
            cy = jax.device_put(cy_s)
            if out_gb > 5.0:
                from .ops.grid import subgrids_to_grid_ranges_streamed

                print(f"grid-add output {out_gb:.1f} GB -> streamed "
                      f"per-stripe range bands")

                def fn(s, x, y):
                    # consume keeps only a corner per band and throttles
                    # the stripe queue (PJRT allocates outputs at enqueue
                    # — unthrottled, all bands allocate before the first
                    # stripe runs and the device OOMs)
                    return subgrids_to_grid_ranges_streamed(
                        s, x, y, g, apply_fft, plan=rplan,
                        consume=lambda band: (band[0][:1, :1],
                                              band[1][:1, :1]),
                    )
            else:
                fn = jax.jit(lambda s, x, y: subgrids_to_grid_ranges(
                    s, x, y, g, apply_fft, plan=rplan))
        else:
            from .ops.grid import subgrids_to_grid_bucketed

            fn = jax.jit(lambda s, x, y: subgrids_to_grid_bucketed(
                s, x, y, g, apply_fft, plan=plan))
        name = ("grid_add" if args.method == "auto"
                else f"grid_add_{args.method}")
        fargs = (sub, cx, cy)
        name += args.suffix
    else:
        import numpy as np

        grid = jax.device_put((
            np.zeros((params.nr_correlations, g, g), np.float32),
            np.zeros((params.nr_correlations, g, g), np.float32),
        ))
        use_ranges = args.method in ("auto", "ranges") and g % n == 0
        use_streamed = False
        if use_ranges:
            from .ops.grid import (extract_ranges_eligible,
                                   extract_streamed_eligible,
                                   grid_to_subgrids_ranges,
                                   grid_to_subgrids_ranges_streamed,
                                   plan_grid_extract_ranges,
                                   sorted_block_coords)

            order, cx_s, cy_s = sorted_block_coords(md.coord_x, md.coord_y,
                                                    g, n)
            eplan = plan_grid_extract_ranges(cx_s, cy_s, g, n)
            use_ranges = extract_ranges_eligible(
                eplan, params.nr_correlations, g, n
            )
            # memory is the only failing condition → the per-stripe
            # streamed formulation (only a stripe of padded block rows
            # is ever materialized)
            use_streamed = not use_ranges and extract_streamed_eligible(
                eplan, params.nr_correlations, g, n
            )
            print(f"grid-extract range plan: {eplan.n_chunks} chunks of "
                  f"{eplan.wc}, window {eplan.k_span}"
                  + ("" if use_ranges
                     else (" -> streamed per-stripe ranges" if use_streamed
                           else " -> fallback gather (payload)")))
        if use_ranges or use_streamed:
            cx = jax.device_put(cx_s)
            cy = jax.device_put(cy_s)
            if use_streamed:
                def fn(gr, x, y):
                    out = grid_to_subgrids_ranges_streamed(
                        gr, x, y, n, apply_fft, plan=eplan)
                    # leading-axis slim: the timing queue otherwise pins
                    # several ~0.8 GB outputs next to the near-HBM grid
                    return tuple(v[:1] for v in out)
            else:
                fn = jax.jit(lambda gr, x, y: grid_to_subgrids_ranges(
                    gr, x, y, n, apply_fft, plan=eplan))
            name = ("grid_extract" if args.method == "auto"
                    else "grid_extract_ranges") + args.suffix
        else:
            fn = jax.jit(
                lambda gr, x, y: grid_to_subgrids(gr, x, y, n, apply_fft)
            )
            name = "grid_extract" + args.suffix
        fargs = (grid, cx, cy)

    timing = time_kernel(fn, *fargs, harness=harness)
    gflops, gbytes, _ = grid_costs(params)
    dev = device_name()
    roofline = roofline_fraction(gflops / timing.seconds, gflops, gbytes, dev)
    report(name, timing.seconds, gflops, gbytes, roofline=roofline,
           seconds_std=timing.seconds_std)
    report_csv(
        name, dev, CSV_EXT, timing.seconds, gflops, gbytes,
        output_path=harness.output_path, roofline=roofline,
        seconds_std=timing.seconds_std,
    )
    return 0


def cmd_pipeline(args) -> int:
    """Single-chip end-to-end imaging pass. direction=grid: gridder
    kernel → subgrid iDFT (+roll phases) → block-range grid
    accumulation; direction=degrid: block-range grid extraction → DFT
    (+conjugate roll phases) → degridder kernel. The production
    compositions the reference's two benchmarks feed into
    (README.md:78-80 stops at subgrids); reports the pass throughput and
    each stage's measured share."""
    import jax
    import numpy as np

    from .config import HarnessConfig, IDGParams
    from .data import make_perf_observation
    from .ops.api import _resolve, staged_runner
    from .ops.grid import (plan_grid_add_ranges, sort_observation_blocks,
                           subgrids_to_grid_ranges)
    from .utils.costs import workload_costs
    from .utils.printing import print_device_info, print_parameters
    from .utils.report import device_name, report, report_csv
    from .utils.roofline import roofline_fraction
    from .utils.timing import time_kernel

    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    print_device_info()
    print_parameters(params)
    g, n = params.grid_size, params.subgrid_size
    if g % n:
        # the range plans require block-tileable grids (the `grid`
        # command falls back per-method; the pipeline is ranges-only)
        print(f"pipeline requires GRID_SIZE % SUBGRID_SIZE == 0 "
              f"(got {g} % {n}); use `grid`/`run` for odd sizes")
        return 1
    obs = make_perf_observation(params)
    # block-sorted metadata: free on the host, enables the range-read
    # grid accumulator/extractor (contiguous runs per grid block)
    obs, _ = sort_observation_blocks(obs, g, n)
    md = obs.metadata
    cx = jax.device_put(md.coord_x)
    cy = jax.device_put(md.coord_y)
    degrid = args.direction == "degrid"
    version = args.version or ("pallas_v7" if degrid else "pallas_v6")

    if degrid:
        from .ops.api import (staged_degridder_chunk_consumers,
                              staged_degridder_consumer)
        from .ops.grid import (GridExtractRangePlan, extract_ranges_eligible,
                               grid_to_subgrids_ranges,
                               plan_grid_extract_ranges, slice_extract_plan)

        from .ops.pallas.degridder import MAX_CHUNK

        eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n)
        s_all = np.asarray(md.coord_x).shape[0]
        if s_all > MAX_CHUNK and MAX_CHUNK % eplan.wc:
            # per-chunk plan slicing needs wc | MAX_CHUNK — only
            # reachable with an IDG_MAX_CHUNK override below the
            # auto-tuned wc; rebuild with the largest compatible wc
            from .ops.grid import EXTRACT_WC_LADDER

            wc = next(w for w in EXTRACT_WC_LADDER if MAX_CHUNK % w == 0)
            eplan = plan_grid_extract_ranges(md.coord_x, md.coord_y, g, n,
                                             wc=wc)
        rng = np.random.default_rng(11)
        grid_pair = jax.device_put(tuple(
            rng.normal(size=(params.nr_correlations, g, g))
            .astype(np.float32) for _ in range(2)
        ))
        ranges_ok = extract_ranges_eligible(
            eplan, params.nr_correlations, g, n
        )
        consumers = None
        fused = False
        if ranges_ok and not args.whole_extract and not args.no_fuse:
            # fused-pieces path (degrid mirror of the gridder default):
            # the extraction emits block-rolled pieces and the degridder
            # kernel's prologue does the forward DFT + roll-back on the
            # MXU — no XLA producer dots at the stage boundary
            from .ops.api import staged_degridder_pieces_chunk_consumers

            oyx_d = np.stack([
                (np.asarray(md.coord_y).astype(np.int64) % g % n),
                (np.asarray(md.coord_x).astype(np.int64) % g % n),
            ], axis=-1)

            def _sample_fn(bounds_):
                # one extraction output with the layouts the runtime
                # producer emits — drives the consumers' AOT layout
                # match (api.staged_degridder_pieces_chunk_consumers)
                cxn_ = np.asarray(md.coord_x)
                cyn_ = np.asarray(md.coord_y)
                if len(bounds_) == 1:
                    out = jax.jit(lambda gr: grid_to_subgrids_ranges(
                        gr, cx, cy, n, apply_fft=True, plan=eplan,
                        pieces="rows"))(grid_pair)
                else:
                    lo, hi = bounds_[0]
                    mc_ = hi - lo
                    sp = slice_extract_plan(eplan, lo, hi)

                    def esh(gr, qb0, tmeta, cx_c, cy_c):
                        p_ = GridExtractRangePlan(
                            qb0, tmeta, eplan.k_span, eplan.wc,
                            mc_ // eplan.wc, eplan.nby, eplan.nbx,
                            mc_, g, n,
                        )
                        return grid_to_subgrids_ranges(
                            gr, cx_c, cy_c, n, apply_fft=True, plan=p_,
                            pieces="rows")

                    out = jax.jit(esh)(grid_pair, sp.qb0, sp.tmeta,
                                       cxn_[lo:hi], cyn_[lo:hi])
                jax.block_until_ready(out)
                return out

            fcons, fbounds, rversion = \
                staged_degridder_pieces_chunk_consumers(
                    params, obs, version, oyx_d, w_rank=args.w_rank,
                    align=eplan.wc, sample_fn=_sample_fn,
                )
            if fcons is not None:
                consumers, bounds, fused = fcons, fbounds, True
        if consumers is None and ranges_ok and not args.whole_extract:
            consumers, bounds, rversion = staged_degridder_chunk_consumers(
                params, obs, version, w_rank=args.w_rank, align=eplan.wc
            )
        if consumers is not None and len(consumers) > 1:
            # per-chunk extraction: each degridder chunk consumes its own
            # sliced-plan extraction directly, so the full [S, P, N, N]
            # intermediate (and the per-chunk slice copies it forces,
            # ~10 ms at the default size) never exists. The plan tables
            # enter the jit as ARGUMENTS (a shim plan with static
            # geometry) so one compiled extraction serves every chunk.
            cxn = np.asarray(md.coord_x)
            cyn = np.asarray(md.coord_y)
            S = cxn.shape[0]
            mc = bounds[0][1] - bounds[0][0]

            def eshim(gr, qb0, tmeta, cx_c, cy_c):
                sp = GridExtractRangePlan(
                    qb0, tmeta, eplan.k_span, eplan.wc, mc // eplan.wc,
                    eplan.nby, eplan.nbx, mc, g, n,
                )
                return grid_to_subgrids_ranges(
                    gr, cx_c, cy_c, n, apply_fft=True, plan=sp,
                    pieces="rows" if fused else False,
                )

            efn_one = jax.jit(eshim)
            echunks = []
            for lo, hi in bounds:
                sp = slice_extract_plan(eplan, lo, hi)
                pad = hi - min(hi, S)
                cx_c = np.concatenate([cxn[lo:hi], np.repeat(cxn[-1:], pad)])
                cy_c = np.concatenate([cyn[lo:hi], np.repeat(cyn[-1:], pad)])
                echunks.append(jax.device_put(
                    (sp.qb0, sp.tmeta, cx_c, cy_c)
                ))

            def grid_stage(gr):
                out = None
                for ec in echunks:
                    out = tuple(v[:1] for v in efn_one(gr, *ec))
                return out

            def pass_fn(gr):
                out = None
                for ec, kc in zip(echunks, consumers):
                    out = kc(efn_one(gr, *ec))
                return out
        else:
            if consumers is not None:
                kfn = consumers[0]
            else:
                kfn, rversion = staged_degridder_consumer(
                    params, obs, version, w_rank=args.w_rank
                )
            efn = jax.jit(lambda gr: grid_to_subgrids_ranges(
                gr, cx, cy, n, apply_fft=True, plan=eplan,
                pieces="rows" if fused else False))

            def grid_stage(gr):
                # leading-axis output slice (probe5: keeps kernel speed,
                # bounds the timing queue's live buffers)
                return tuple(v[:1] for v in efn(gr))

            def pass_fn(gr):
                return kfn(efn(gr))

        stage_args = (grid_pair,)
        kernel_args = None
        kname = "degridder"
    else:
        rversion, rw_rank = _resolve("gridder", version, params, obs,
                                     args.w_rank)
        plan = plan_grid_add_ranges(md.coord_x, md.coord_y, g, n)
        kfn = kernel_args = None
        if not args.no_fuse:
            # fused-pieces path: the kernel epilogue applies the roll
            # phases + folded-shift iDFT on the MXU and emits the pieces
            # straight into the range grid-add — zero-copy rows form on
            # tile-path plans, 4-D on sparse ones (the shared recipe,
            # also used by bench.py)
            from .ops.api import gridded_pipeline_parts

            kfn, kernel_args, gfn_t, rversion, plan = \
                gridded_pipeline_parts(params, obs, rversion,
                                       w_rank=rw_rank, plan=plan)
        if kfn is not None:
            def pass_fn(*a):
                return gfn_t(kfn(*a))
        else:
            kfn, kernel_args = staged_runner(
                "gridder", rversion, params, obs, w_rank=rw_rank)
            gfn = jax.jit(lambda s: subgrids_to_grid_ranges(
                s, cx, cy, g, apply_fft=True, plan=plan))

            # One explicit S-minor relayout at the stage boundary: the
            # grid stage's DFT dots want batch-minor input (XLA's
            # preferred layout for batched [32,32] matmuls), and a single
            # device_put transpose (~4 ms) beats the per-consumer
            # relayout copies XLA otherwise inserts inside the module
            # (~15 ms measured at the default size).
            sub_fmt = None
            try:
                from jax.experimental.layout import Format, Layout
                from jax.sharding import SingleDeviceSharding

                sub_fmt = Format(
                    Layout(major_to_minor=(1, 2, 3, 0)),
                    SingleDeviceSharding(jax.devices()[0]),
                )
            except Exception:
                sub_fmt = None

            def pass_fn(*a):
                sub = kfn(*a)
                if sub_fmt is not None:
                    sub = jax.device_put(sub, (sub_fmt, sub_fmt))
                return gfn(sub)

        stage_args = kernel_args
        kname = "gridder"

    if degrid:
        t_kernel = None  # measured as (pass − grid stage) below
        t_other = time_kernel(grid_stage, *stage_args, harness=harness).seconds
    else:
        t_kernel = time_kernel(kfn, *kernel_args, harness=harness).seconds
        t_other = None
    timing = time_kernel(pass_fn, *stage_args, harness=harness)
    if t_kernel is None:
        t_grid = min(t_other, timing.seconds)
        t_kernel = max(timing.seconds - t_grid, 0.0)
    else:
        t_grid = max(timing.seconds - t_kernel, 0.0)
    gflops, gbytes, mvis = workload_costs(params)
    from .utils.costs import grid_costs

    ggflops, ggbytes, _ = grid_costs(params)
    gflops, gbytes = gflops + ggflops, gbytes + ggbytes
    dev = device_name()
    name = (f"pipeline_{'degrid_' if degrid else ''}{rversion}"
            + args.suffix)
    roofline = roofline_fraction(gflops / timing.seconds, gflops, gbytes, dev)
    print(f"    stage split: {kname} {t_kernel*1e3:.1f} ms "
          f"({100*t_kernel/timing.seconds:.0f}%), grid stage "
          f"{t_grid*1e3:.1f} ms ({100*t_grid/timing.seconds:.0f}%)")
    report(name, timing.seconds, gflops, gbytes, mvis, roofline=roofline,
           seconds_std=timing.seconds_std)
    report_csv(
        name, dev, CSV_EXT, timing.seconds, gflops, gbytes, mvis,
        output_path=harness.output_path, roofline=roofline,
        seconds_std=timing.seconds_std,
        extra={"grid_stage_ms": t_grid * 1e3,
               "grid_stage_pct": 100 * t_grid / timing.seconds},
    )
    return 0


def cmd_list(args) -> int:
    from .ops.registry import list_kernels

    for entry in list_kernels():
        print(f"{entry.workload:>10s}  {entry.version:<16s} [{entry.family}]  {entry.description}")
    return 0


def cmd_info(args) -> int:
    from .utils.printing import print_device_info

    print_device_info()
    return 0


def cmd_scaling(args) -> int:
    """Strong-scaling report over mesh sizes (new vs the reference; the
    BASELINE.json north-star scaling-efficiency measurement): the GLOBAL
    problem size is fixed while the mesh grows, so the efficiency column
    is speedup/n_dev relative to the smallest measured mesh (100% =
    linear speedup at fixed total work).

    Workloads: gridder / degridder (subgrid-batch DP, no collectives),
    pipeline (gridder → subgrid FFT → grid reduction, replicated via staged
    psum or row-sharded via psum_scatter with --grid-sharded), and
    pipeline-degrid (grid → tile extract + FFT → degridder; --grid-sharded
    keeps the grid row-sharded and all_gathers over ICI — the adjoint
    collective of the gridder direction's psum_scatter). With
    --distributed, initializes jax.distributed first (multi-host run; every
    process executes the same command)."""
    import jax

    from .config import HarnessConfig, IDGParams
    from .data import initialize_subgrids, make_perf_observation
    from .parallel import make_mesh
    from .parallel.distributed import distribute_observation, init_distributed
    from .parallel.sharded import (
        sharded_degridder,
        sharded_gridder,
        sharded_gridder_to_grid,
    )
    from .types import split_complex, split_observation
    from .utils.costs import workload_costs
    from .utils.timing import time_kernel

    if args.distributed:
        init_distributed()

    params = IDGParams.from_env()
    harness = HarnessConfig.from_env()
    obs = make_perf_observation(params)
    sobs = split_observation(obs)
    sub_pair = None
    if args.workload == "degridder":
        sub_pair = split_complex(initialize_subgrids(
            params.nr_subgrids, params.nr_correlations, params.subgrid_size
        ))
    # Apply the API correctness guards here (the sharded builders are
    # guard-free internals — parallel/sharded.py module docstring).
    from .ops.api import _resolve

    kernel_workload = {
        "pipeline": "gridder", "pipeline-degrid": "degridder",
    }.get(args.workload, args.workload)
    version, w_rank = _resolve(kernel_workload, args.version, params, obs, None)
    _, _, mvis = workload_costs(params)
    sizes = [int(s) for s in args.mesh_sizes.split(",")]
    base = base_n = None
    print(f"workload={args.workload} version={version}"
          + (f" (resolved from {args.version})" if version != args.version else ""))
    print(f"{'devices':>8s} {'ms':>10s} {'MVis/s':>12s} {'efficiency':>11s}")
    for n_dev in sizes:
        if n_dev > len(jax.devices()):
            print(f"{n_dev:>8d}  (skipped: only {len(jax.devices())} devices)")
            continue
        if args.distributed and n_dev % jax.process_count():
            # a mesh must span every process's devices in a
            # multi-controller run (see distributed._local_rows)
            print(f"{n_dev:>8d}  (skipped: not a multiple of "
                  f"{jax.process_count()} processes)")
            continue
        mesh = make_mesh(n_dev)
        if args.workload == "gridder":
            sharded_sobs, _ = distribute_observation(params, sobs, mesh)
            fn = sharded_gridder(params, mesh, version, w_rank=w_rank)
            fargs = (sharded_sobs,)
        elif args.workload == "degridder":
            from .parallel.distributed import distribute_subgrid_pair

            # pad/shard the subgrid pair to the observation's padded row
            # count (shard_map needs matching, mesh-divisible axes;
            # process-local slicing in multi-host runs)
            sharded_sobs, s_pad = distribute_observation(params, sobs, mesh)
            spair = distribute_subgrid_pair(sub_pair, mesh, s_pad)
            fn = sharded_degridder(params, mesh, version, w_rank=w_rank)
            fargs = (sharded_sobs, spair)
        elif args.workload == "pipeline-degrid":
            import numpy as np
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from .parallel.sharded import (sharded_grid_to_degridder,
                                           sharded_grid_to_degridder_gather)

            sharded_sobs, _ = distribute_observation(params, sobs, mesh)
            rng = np.random.default_rng(11)
            gsz = params.grid_size
            grid_host = tuple(
                rng.normal(size=(params.nr_correlations, gsz, gsz))
                .astype(np.float32) for _ in range(2)
            )
            if args.grid_sharded and gsz % n_dev == 0:
                spec = P(None, mesh.axis_names[-1], None)
                grid_pair = tuple(
                    jax.device_put(v, NamedSharding(mesh, spec))
                    for v in grid_host
                )
                fn = sharded_grid_to_degridder_gather(
                    params, mesh, version, w_rank=w_rank)
            else:
                if args.grid_sharded:
                    print(f"  (grid {gsz} not divisible by {n_dev} rows; "
                          "using the replicated grid)")
                grid_pair = jax.device_put(grid_host)
                fn = sharded_grid_to_degridder(
                    params, mesh, version, w_rank=w_rank)
            fargs = (sharded_sobs, grid_pair)
        else:  # pipeline: gridder + FFT + grid reduction collective
            use_ranges = args.grid_method == "ranges" and not args.distributed
            if use_ranges:
                from .parallel.sharded import shard_observation_block_sorted

                (sharded_sobs, _, (tstarts, lens),
                 rw) = shard_observation_block_sorted(params, sobs, mesh)
                fn = sharded_gridder_to_grid(
                    params, mesh, version, grid_sharded=args.grid_sharded,
                    w_rank=w_rank, grid_method="ranges", range_w=rw,
                )
                fargs = (sharded_sobs, tstarts, lens)
            else:
                if args.grid_method == "ranges":
                    print("grid-method ranges: single-process only; "
                          "using scatter")
                sharded_sobs, _ = distribute_observation(params, sobs, mesh)
                fn = sharded_gridder_to_grid(
                    params, mesh, version, grid_sharded=args.grid_sharded,
                    w_rank=w_rank,
                )
                fargs = (sharded_sobs,)
        timing = time_kernel(fn, *fargs, harness=harness)
        rate = mvis / timing.seconds
        if base is None:
            base, base_n = rate, n_dev  # first MEASURED mesh, not sizes[0]
        eff = rate / (base * n_dev / base_n)
        print(
            f"{n_dev:>8d} {timing.seconds * 1e3:>10.2f} {rate:>12.2f} "
            f"{eff:>10.1%}  (±{timing.seconds_std * 1e3:.2f} ms)"
        )
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="idg-bench", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="run one kernel in perf or check mode")
    p_run.add_argument("--workload", choices=["gridder", "degridder"], required=True)
    p_run.add_argument("--version", default="xla_v4")
    p_run.add_argument("--mode", choices=["perf", "check"], default="perf")
    p_run.add_argument("--mesh", type=int, default=None, help="shard over N devices")
    p_run.add_argument("--w-rank", type=int, default=None,
                       help="w-term Taylor rank override (1 is exact for w==0 data)")
    p_run.add_argument("--w-obs", action="store_true",
                       help="perf: use the nonzero-w generator (w-plane "
                            "metadata; CSV suffixed _wobs)")
    p_run.add_argument("--suffix", default="",
                       help="perf: extra CSV/report name suffix (e.g. "
                            "_lofar4096 for non-default problem sizes)")
    p_run.add_argument("--sustain", type=float, default=None, metavar="S",
                       help="perf: also run a sustained ~S-second launch "
                            "window (the reference's energy-loop "
                            "semantics) and record sustained ms/launch + "
                            "drift in the CSV")
    p_run.set_defaults(fn=cmd_run)

    p_sweep = sub.add_parser("sweep", help="run many kernels (run_perf_*.sh analogue)")
    p_sweep.add_argument("--workloads", default="gridder,degridder")
    p_sweep.add_argument("--versions", default="all")
    p_sweep.add_argument("--mode", choices=["perf", "check"], default="perf")
    p_sweep.add_argument("--mesh", type=int, default=None)
    p_sweep.add_argument("--stations", type=int, default=None,
                         help="shrink the problem to N stations (ladder size)")
    p_sweep.add_argument("--fullsize", action="store_true",
                         help="reference perf defaults + _fullsize CSV suffix")
    p_sweep.set_defaults(fn=cmd_sweep)

    p_vadd = sub.add_parser("vadd", help="bandwidth smoke benchmark")
    p_vadd.add_argument("--n", type=int, default=256 * 1024 * 1024)
    p_vadd.add_argument("--pallas", action="store_true")
    p_vadd.set_defaults(fn=cmd_vadd)

    p_grid = sub.add_parser("grid", help="grid-stage benchmark (FFT + scatter-add)")
    p_grid.add_argument("--direction", choices=["to-grid", "to-subgrids"],
                        default="to-grid")
    p_grid.add_argument("--no-fft", action="store_true",
                        help="scatter/gather only (skip the subgrid DFT)")
    p_grid.add_argument("--method",
                        choices=["auto", "bucket", "scatter", "pallas",
                                 "ranges"],
                        default="auto",
                        help="to-grid accumulation: auto prefers the "
                             "block-sorted range kernel (static window "
                             "DMAs), then the Pallas slot reduction / "
                             "XLA windowed scatter by plan density; "
                             "bucket = XLA gather/reduce (slow on TPU, "
                             "kept for comparison)")
    p_grid.add_argument("--suffix", default="",
                        help="extra CSV/report name suffix (e.g. _8192)")
    p_grid.set_defaults(fn=cmd_grid)

    p_pipe = sub.add_parser(
        "pipeline",
        help="end-to-end pass: gridder -> iDFT -> grid accumulation, or "
             "grid extraction -> DFT -> degridder")
    p_pipe.add_argument("--direction", choices=["grid", "degrid"],
                        default="grid")
    p_pipe.add_argument("--version", default=None,
                        help="kernel version (default pallas_v6 gridder / "
                             "pallas_v7 degridder)")
    p_pipe.add_argument("--w-rank", type=int, default=None)
    p_pipe.add_argument("--whole-extract", action="store_true",
                        help="degrid direction: extract all subgrids in "
                        "one pass and dynamic-slice chunks into the "
                        "degridder instead of per-chunk extraction (A/B)")
    p_pipe.add_argument("--no-fuse", action="store_true",
                        help="grid direction: disable the fused-pieces "
                        "kernel epilogue (iDFT+roll in-kernel) and run "
                        "the XLA producer + boundary relayout instead "
                        "(A/B)")
    p_pipe.add_argument("--suffix", default="")
    p_pipe.set_defaults(fn=cmd_pipeline)

    sub.add_parser("list", help="list registered kernels").set_defaults(fn=cmd_list)
    sub.add_parser("info", help="print device info").set_defaults(fn=cmd_info)

    p_scal = sub.add_parser("scaling",
                            help="strong-scaling efficiency report "
                                 "(fixed global problem over mesh sizes)")
    p_scal.add_argument("--workload",
                        choices=["gridder", "degridder", "pipeline",
                                 "pipeline-degrid"],
                        default="gridder")
    p_scal.add_argument("--version", default="xla_v4")
    p_scal.add_argument("--mesh-sizes", default="1,2,4,8")
    p_scal.add_argument("--grid-sharded", action="store_true",
                        help="pipeline: psum_scatter row-sharded grid")
    p_scal.add_argument("--grid-method", choices=["scatter", "ranges"],
                        default="scatter",
                        help="pipeline grid stage: windowed scatter or the "
                             "per-shard block-sorted range kernel "
                             "(single-process meshes)")
    p_scal.add_argument("--distributed", action="store_true",
                        help="initialize jax.distributed (multi-host)")
    p_scal.set_defaults(fn=cmd_scaling)

    args = parser.parse_args(argv)
    _honor_platform_env()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
