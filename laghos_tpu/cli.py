"""Command-line driver mirroring the reference Laghos CLI.

Flag names follow laghos.cpp:181-278 so reference command lines translate
1:1, e.g.:
    python -m laghos_tpu -p 0 -m data/square01_quad.mesh -rs 3 -tf 0.75 -pa
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(
        prog="laghos_tpu", description="TPU-native Lagrangian hydrodynamics")
    p.add_argument("-dim", "--dimension", type=int, default=3, dest="dim")
    p.add_argument("-m", "--mesh", default="default", dest="mesh")
    p.add_argument("-nx", "--xelems", type=int, default=2, dest="nx")
    p.add_argument("-ny", "--yelems", type=int, default=2, dest="ny")
    p.add_argument("-nz", "--zelems", type=int, default=2, dest="nz")
    p.add_argument("-E0", "--blast-energy", type=float, default=1.0,
                   dest="blast_energy")
    p.add_argument("-Sx", "--xwidth", type=float, default=1.0, dest="xwidth")
    p.add_argument("-Sy", "--ywidth", type=float, default=1.0)
    p.add_argument("-Sz", "--zwidth", type=float, default=1.0)
    p.add_argument("-rs", "--refine-serial", type=int, default=2,
                   dest="rs")
    p.add_argument("-rp", "--refine-parallel", type=int, default=0,
                   dest="rp")
    p.add_argument("-epm", "--elem-per-mpi", type=int, default=0, dest="epm")
    p.add_argument("-p", "--problem", type=int, default=1, dest="problem")
    p.add_argument("-ok", "--order-kinematic", type=int, default=2,
                   dest="order_v")
    p.add_argument("-ot", "--order-thermo", type=int, default=1,
                   dest="order_e")
    p.add_argument("-oq", "--order-intrule", type=int, default=-1,
                   dest="order_q")
    p.add_argument("-s", "--ode-solver", type=int, default=4,
                   dest="ode_solver")
    p.add_argument("-tf", "--t-final", type=float, default=0.6,
                   dest="t_final")
    p.add_argument("-cfl", "--cfl", type=float, default=0.5)
    p.add_argument("-cgt", "--cg-tol", type=float, default=1e-8,
                   dest="cg_tol")
    p.add_argument("-ftz", "--ftz-tol", type=float, default=0.0,
                   dest="ftz_tol",
                   help="accepted for reference CLI parity but "
                        "numerically dead, exactly like the reference "
                        "(laghos.cpp:233 parses it and never uses it; "
                        "the PA force flush-to-zero is hardcoded eps^2)")
    p.add_argument("-dtol", "--delta-tol", type=float, default=1e-12,
                   dest="delta_tol")
    p.add_argument("-cgm", "--cg-max-steps", type=int, default=300,
                   dest="cg_max_iter")
    p.add_argument("-ms", "--max-steps", type=int, default=-1,
                   dest="max_steps")
    p.add_argument("-pa", "--partial-assembly", action="store_true",
                   default=True, dest="pa")
    p.add_argument("-fa", "--full-assembly", action="store_false",
                   dest="pa")
    p.add_argument("-iv", "--impose-viscosity", action="store_true",
                   dest="impose_visc")
    p.add_argument("-vs", "--visualization-steps", type=int, default=5,
                   dest="vis_steps")
    p.add_argument("-print", "--print", action="store_true", dest="gfprint")
    p.add_argument("-visit", "--visit", action="store_true", dest="visit")
    p.add_argument("-vis", "--visualization", action="store_true",
                   dest="visualization",
                   help="stream rho/e/v to a live GLVis server every "
                        "vis step (laghos.cpp:691-738)")
    p.add_argument("--glvis", default="localhost:19916",
                   help="GLVis server host:port for -vis")
    p.add_argument("-mb", "--mem", action="store_true", dest="mem_usage")
    p.add_argument("-k", "--outputfilename", default="results/Laghos",
                   dest="basename")
    p.add_argument("-d", "--device", default=None,
                   help="jax platform (cpu/tpu/axon); default: jax default")
    p.add_argument("-chk", "--checks", action="store_true", dest="check")
    p.add_argument("-err", "--exact-error", action="store_true",
                   dest="check_exact_sedov")
    p.add_argument("-f", "--fom", action="store_true", dest="fom")
    p.add_argument("-nd", "--n-devices", type=int, default=1,
                   dest="n_devices",
                   help="shard the element axis over this many devices")
    p.add_argument("-sfc", "--sfc-partition", action="store_true",
                   dest="sfc",
                   help="reorder elements along a Morton space-filling "
                        "curve so equal contiguous chunks form the "
                        "device partition (METIS-replacement for "
                        "unstructured meshes with -nd)")
    p.add_argument("--halo", action="store_true", dest="halo",
                   help="with -nd: structured-slab shard_map distribution "
                        "(ppermute plane halos, psum dots, pmin dt — the "
                        "production multi-chip path) instead of GSPMD "
                        "sharding")
    p.add_argument("--pencil", type=str, default=None, metavar="DZxDY",
                   help="with --halo: partition the last TWO element "
                        "axes over a DZxDY device mesh (e.g. 2x4) "
                        "instead of 1-axis slabs")
    p.add_argument("-amr", "--enable-amr", action="store_true", dest="amr",
                   help="adaptive mesh refinement (problem 1 only; "
                        "amr/laghos.cpp:106-113)")
    p.add_argument("-rt", "--ref-threshold", type=float, default=2e-4,
                   dest="ref_threshold", help="AMR refinement threshold")
    p.add_argument("-dt", "--deref-threshold", type=float, default=0.75,
                   dest="deref_threshold",
                   help="AMR derefinement threshold (0 = no derefinement)")
    p.add_argument("--device-loop", action="store_true", dest="device_loop",
                   help="run the adaptive-dt control flow on device "
                        "(lax.while_loop segments; one host sync per "
                        "vis interval instead of per step — removes "
                        "~25 ms/step of tunnel latency on TPU). Same "
                        "math; f64 trajectories match the host loop "
                        "exactly, f32 to compilation-rounding level.")
    p.add_argument("--dtype", default="f64", choices=["f64", "f32"])
    p.add_argument("--mxu", default="f32", choices=["f32", "bf16"],
                   help="TPU matmul precision for f32 data: f32 = 3-pass"
                        " MXU (accurate, the package default); bf16 ="
                        " single pass (~2.6e-3 operator error, ~12x"
                        " faster qupdate at rs4 — the speed mode the"
                        " bench's bf16-MXU rows measure)")
    p.add_argument("--ozaki", action="store_true", dest="ozaki",
                   help="f64 TPU production mode: hot contractions as "
                        "int8-MXU integer-slice matmuls (3D PA only)")
    p.add_argument("--precond", default="jacobi",
                   choices=["jacobi", "auto", "kron", "schwarz"],
                   help="velocity CG preconditioner (jacobi = reference "
                        "parity, the CLI default; kron = per-axis "
                        "Kronecker-exact lattice inverse, ~1-3 CG "
                        "iterations/solve on raster meshes; auto = kron "
                        "where available else jacobi; schwarz = element-"
                        "block additive Schwarz)")
    p.add_argument("--checkpoint", default=None,
                   help="write an NPZ checkpoint of (S, t, dt, step) here "
                        "every vis_steps")
    p.add_argument("--restore", default=None,
                   help="resume from an NPZ checkpoint")
    p.add_argument("--debug-nans", action="store_true", dest="debug_nans",
                   help="trap non-finite values in every kernel "
                        "(jax debug_nans; the CheckFinite/MFEM_VERIFY "
                        "equivalent, SURVEY §5)")
    p.add_argument("--profile", default=None,
                   help="write a jax profiler trace (Caliper-equivalent, "
                        "SURVEY §5) to this directory during the run")
    return p


def _refine(m):
    """Uniform refinement that dispatches on the mesh family (tensor
    Mesh vs TriMesh/TetMesh simplices)."""
    from .fem import mesh as fmesh
    from .fem import simplex_mesh as fsm

    if isinstance(m, fsm.TriMesh):
        return fsm.uniform_refine_tri(m)
    if isinstance(m, fsm.TetMesh):
        return fsm.uniform_refine_tet(m)
    return fmesh.uniform_refine(m)


def make_mesh(args):
    from .fem import mesh as fmesh

    if args.epm:
        # controlled-scaling mesh: n_devices x elems-per-device elements
        # (README.md:271-278 semantics)
        from .parallel.scaling import epm_mesh

        m, _, _ = epm_mesh(args.dim, max(1, args.n_devices), args.epm,
                           (args.xwidth, args.ywidth, args.zwidth))
        return m
    if args.mesh != "default":
        from .data import get_mesh

        m = get_mesh(args.mesh)
        for _ in range(args.rs):
            m = _refine(m)
    else:
        dim = args.dim
        n = (args.nx, args.ny, args.nz)
        sizes = (args.xwidth, args.ywidth, args.zwidth)
        m = fmesh.cartesian(dim, n, sizes)
        for _ in range(args.rs):
            m = _refine(m)
    for _ in range(args.rp):
        m = _refine(m)
    if getattr(args, "sfc", False):
        from .parallel.partition import sfc_partition

        m = sfc_partition(m)
    return m


def _main_amr(args):
    """AMR run (amr/laghos.cpp): RefineAtVertex initial mesh, viscosity-
    estimator refinement, density-based derefinement.  Problem 1 only;
    blast energy is the variant's fixed 0.25 and h0 its fixed
    0.5/order_v (SetH0)."""
    if args.problem != 1:
        raise SystemExit("AMR only supported for problem 1.")
    from .amr.driver import run_amr
    from .amr.forest import Forest
    from .amr.solver import AMRHydro
    from .hydro import Options

    base = {"square01_quad": (2, (2, 2), (1.0, 1.0)),
            "cube01_hex": (3, (2, 2, 2), (1.0, 1.0, 1.0))}
    name = args.mesh.rsplit("/", 1)[-1].removesuffix(".mesh")
    if name in base:
        dim, base_n, sizes = base[name]
    else:
        dim = args.dim
        base_n = (args.nx, args.ny, args.nz)[:dim]
        sizes = (args.xwidth, args.ywidth, args.zwidth)[:dim]
    levels = args.rs + args.rp
    f = Forest(dim, base_n, sizes, max_depth=levels)
    # initial mesh: RefineAtVertex at the blast corner, rs+rp times,
    # WITHOUT 2:1 balancing (amr/laghos.cpp:199-209)
    for _ in range(levels):
        corner = [k for k in f.leaf_list() if all(v == 0 for v in k[1])]
        f.refine(corner, balance=False)
    opt = Options(problem=1, blast_energy=0.25, order_v=args.order_v,
                  order_e=args.order_e, order_q=args.order_q,
                  cfl=args.cfl, cg_tol=args.cg_tol,
                  cg_max_iter=args.cg_max_iter,
                  ode_solver=args.ode_solver)
    h = AMRHydro(f, opt, h0=0.5 / args.order_v)
    if args.n_devices > 1:
        from .parallel.sharding import device_mesh, shard_amr

        shard_amr(h, device_mesh(args.n_devices))
    print(f"Number of zones in the initial AMR mesh: {h.NE}")
    res = run_amr(h, t_final=args.t_final,
                  ref_threshold=args.ref_threshold,
                  deref_threshold=args.deref_threshold,
                  max_steps=args.max_steps, vis_steps=args.vis_steps,
                  verbose=True)
    print(f"step {res['steps']:5d},\tt = {res['t']:.4f},"
          f"\tdt = {res['dt']:.6f},\t|e| = {res['e_norm']:.10e}"
          f"  NE={res['NE']}")
    return res


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    if args.mxu == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    # persistent compile cache (first full-step compile is 20-40 s on
    # TPU, minutes at scale; cached reruns start in seconds)
    try:
        import os as _os

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from . import driver
    from .hydro import Hydro, Options
    from .timing import print_timing

    if args.amr:
        return _main_amr(args)

    m = make_mesh(args)
    print(f"Number of zones in the serial mesh: {m.num_elems}")

    from .fem.simplex_mesh import TetMesh, TriMesh

    if isinstance(m, (TriMesh, TetMesh)):
        # simplex meshes (triangles/tets) run on the simplex (FA) solver
        from .simplex_hydro import SimplexHydro

        th = SimplexHydro(m, Options(
            problem=args.problem, order_v=args.order_v,
            order_e=args.order_e, order_q=args.order_q, cfl=args.cfl,
            cg_tol=args.cg_tol, cg_max_iter=args.cg_max_iter))
        S, t, steps = th.run(args.t_final, max_steps=args.max_steps,
                             verbose=True)
        en = float((np.asarray(S["e"]) ** 2).sum()) ** 0.5
        print(f"step {steps:5d},\tt = {t:.4f},\t|e| = {en:.10e}")
        return None

    opt = Options(
        problem=args.problem, order_v=args.order_v, order_e=args.order_e,
        order_q=args.order_q, cfl=args.cfl, cg_tol=args.cg_tol,
        cg_max_iter=args.cg_max_iter, ftz_tol=args.ftz_tol,
        p_assembly=args.pa, impose_visc=args.impose_visc,
        blast_energy=args.blast_energy, delta_tol=args.delta_tol,
        ode_solver=args.ode_solver, ozaki=args.ozaki,
        precond=args.precond)
    dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
    h = Hydro(m, opt, dtype=dtype)
    run_h = h
    if args.n_devices > 1:
        if args.halo:
            if h._sm is not None:
                from .parallel.slab_hydro import SlabHydro

                ms = (tuple(int(x)
                            for x in args.pencil.lower().split("x"))
                      if args.pencil else None)
                run_h = SlabHydro(h, n_devices=args.n_devices,
                                  mesh_shape=ms)
            else:
                # unstructured meshes: SFC element chunks with an
                # owned-dof boundary exchange (use -sfc for good cuts)
                from .parallel.chunk_hydro import ChunkHydro

                run_h = ChunkHydro(h, n_devices=args.n_devices)
        else:
            from .parallel.sharding import device_mesh, shard_hydro

            shard_hydro(h, device_mesh(args.n_devices))
    print(f"Number of kinematic (position, velocity) dofs: "
          f"{h.ndof * m.dim}")
    print(f"Number of specific internal energy dofs: {h.NE * h.ld}")

    S_init, t0, dt0, st0 = None, 0.0, None, 1
    if args.restore:
        from .checkpoint import load

        S_init, t0, dt0, st0 = load(args.restore)
        # the checkpoint records the last COMPLETED step; resume at the
        # next one so norms keys / vis cadence / --checks step alignment
        # match an uninterrupted run
        st0 += 1
    check_steps = ()
    if args.check:
        from .verify import CHECKS_TABLE

        assert args.rs == 0 and args.rp == 0, "check: rs, rp"
        assert args.order_v == 2 and args.order_e == 1, "check: orders"
        assert args.ode_solver == 4 and args.t_final == 0.6, "check: cfg"
        assert args.cfl == 0.5, "check: cfl"
        check_steps = tuple(
            s for s, _ in CHECKS_TABLE[m.dim][args.problem])
    on_vis = None
    if args.visit or args.gfprint:
        from .io import DataCollection

        dc = DataCollection(args.basename, h)
        dc.save(0, 0.0, h.S0)
        on_vis = lambda ti, t, S: dc.save(ti, t, S)  # noqa: E731
    if args.visualization:
        from .vis import GLVisSession

        host, _, port = args.glvis.partition(":")
        gl = GLVisSession(h, host or "localhost", int(port or 19916))
        gl.step(h.S0)
        prev_vis = on_vis
        if prev_vis is None:
            on_vis = lambda ti, t, S: gl.step(S)  # noqa: E731
        else:
            on_vis = (lambda ti, t, S, p=prev_vis:
                      (p(ti, t, S), gl.step(S)))
    import contextlib

    prof = (jax.profiler.trace(args.profile) if args.profile
            else contextlib.nullcontext())
    if run_h is not h:
        if S_init is not None:
            raise SystemExit("--restore is not supported with --halo yet")
        if on_vis is not None:
            inner_vis = on_vis
            on_vis = lambda ti, t, S: inner_vis(  # noqa: E731
                ti, t, run_h.to_global(S))
    with prof:
        res = driver.run(
            run_h, t_final=args.t_final, max_steps=args.max_steps,
            vis_steps=args.vis_steps, verbose=True, timing=args.fom,
            S_init=S_init, t_init=t0, dt_init=dt0, step_init=st0,
            checkpoint_path=args.checkpoint, check_steps=check_steps,
            on_vis=on_vis,
            device_loop=(args.device_loop and not args.fom
                         # distributed: the halo paths run the segment
                         # loop under shard_map (parallel/segment.py);
                         # GSPMD mode and checkpointing (local-layout
                         # state files) keep the host loop
                         and (run_h is h or (args.halo
                                             and not args.checkpoint))))
    if run_h is not h and res.S is not None:
        res = dataclasses.replace(res, S={
            k: jnp.asarray(v) for k, v in run_h.to_global(res.S).items()})
    if args.check:
        from .verify import run_checks

        run_checks(args.problem, m.dim, res.norms)
        print("Checks passed.")

    rk_stages = {1: 1, 2: 2, 3: 3, 4: 4, 6: 8, 7: 2}[args.ode_solver]
    steps = res.steps * rk_stages
    if res.timing_data is not None:
        fom_res = print_timing(
            res.timing_data, steps=steps, H1_dofs=h.ndof * m.dim,
            L2_dofs=h.NE * h.ld, NQ=h.NQ, NE=h.NE,
            p_assembly=h.p_assembly, dim=m.dim, fom_table=args.fom)
        if args.fom:
            # Adiak-style provenance record (laghos.cpp:1288-1346)
            import json as _json

            from .timing import run_metadata

            meta = run_metadata(args=args, opt=opt, result=fom_res,
                                extra={"NE": h.NE, "steps": res.steps,
                                       "t_final": res.t,
                                       "e_norm": res.e_norm})
            with open("laghos_run_metadata.json", "w") as fp:
                _json.dump(meta, fp, indent=1, default=str)
            print("Run metadata written to laghos_run_metadata.json")

    print("")
    print(f"Energy  diff: {abs(res.energy_init - res.energy_final):.2e}")
    if args.mem_usage:
        from .io import device_memory_stats, max_rss_mb

        print(f"Maximum memory resident set size: {max_rss_mb()} MB")
        for dev, stats in device_memory_stats().items():
            if stats:
                used = stats.get("bytes_in_use", 0) // (1024 * 1024)
                print(f"  {dev}: {used} MB in use")

    if args.problem in (0, 4):
        from .verify import velocity_error_norms

        linf, l1, l2 = velocity_error_norms(h, res.S)
        print(f"L_inf  error: {linf}")
        print(f"L_1    error: {l1}")
        print(f"L_2    error: {l2}")

    if args.check_exact_sedov:
        from .sedov import sedov_density_l2_error

        err = sedov_density_l2_error(h, res.S, res.t, args.blast_energy)
        print(f"Density L2 error: {err}")
    return res


if __name__ == "__main__":
    main()
