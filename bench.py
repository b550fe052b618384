"""Benchmark entrypoint: prints ONE JSON line with the headline metric.

Headline metric (BASELINE.md): MCMC iterations/sec on an n=1e5 bivariate AG10
dataset on one TPU chip, with held-out RMSPE for accuracy parity.  The full
benchmark ladder from BASELINE.json is available via --config 1..5:

  1  univariate exponential GP, n=625 grid, 10% missing (README example)
  2  univariate n=1e4, deeper axis-parallel tree
  3  bivariate q=2 AG10, n=1e5 (default; the north-star config)
  4  imbalanced multivariate q=3, misaligned per-outcome locations
  5  climate-scale n~1e6, bivariate (satellite+station style imbalance)

The reference package publishes NO benchmark numbers and R is not installed
here, so no measured CPU baseline exists (BASELINE.md).  ``vs_baseline`` is
therefore an explicitly-labeled CONSERVATIVE estimate: iters/sec divided by an
ideal-10-thread-scaling extrapolation of the CRAN runtime bound (n=225, 600
iters in <5 s on ONE thread => >=120 it/s; O(n) per-iteration cost).  The
optimistic end of the range (1-thread extrapolation) is reported separately as
``vs_cpu_1thread_est``; the truth is somewhere in [vs_baseline,
vs_cpu_1thread_est].  ``tflops_per_sec`` uses XLA's own flop count for the
compiled sampling chunk.
"""

import argparse
import json
import time

import numpy as np


def _latent_field(coords, rng, scales=((0.4, 1.0), (0.08, 0.5)), k=64):
    """Cheap stand-in GP draw: random exp-kernel features (O(n*k) setup)."""
    w = np.zeros(len(coords))
    for scale, amp in scales:
        centers = rng.uniform(size=(k, coords.shape[1]))
        d = np.linalg.norm(coords[:, None, :] - centers[None], axis=-1)
        w += amp * (np.exp(-d / scale) @ rng.normal(size=k)) / np.sqrt(k)
    return w


def make_univariate(n, seed=7, miss=0.1):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2))
    p = 3
    X = rng.normal(size=(n, p))
    B = np.array([-1.0, 0.5, 1.0])
    w = _latent_field(coords, rng)
    y_full = X @ B + w + np.sqrt(0.1) * rng.normal(size=n)
    m = rng.uniform(size=n) < miss
    return np.where(m, np.nan, y_full), y_full, m, X, coords, None


def make_multivariate(n_per_q, q=2, seed=7, miss=0.1, imbalance=None):
    """q margins; ``imbalance`` gives per-margin sampling weights for
    misaligned sensor locations (reference vignette setting)."""
    rng = np.random.default_rng(seed)
    if imbalance is None:
        base = rng.uniform(size=(n_per_q, 2))
        coords = np.repeat(base, q, axis=0)
        mv = np.tile(np.arange(1, q + 1), n_per_q)
    else:
        parts = []
        mvs = []
        for j, frac in enumerate(imbalance):
            nj = int(n_per_q * q * frac)
            parts.append(rng.uniform(size=(nj, 2)))
            mvs.append(np.full(nj, j + 1))
        coords = np.vstack(parts)
        mv = np.concatenate(mvs)
    n = len(coords)
    p = 2
    X = rng.normal(size=(n, p))
    B = rng.normal(size=(p, q))
    mv0 = mv - 1
    w = _latent_field(coords, rng)
    w = w * (1.0 + 0.3 * mv0)  # margin-dependent scale
    tausq = 0.1 + 0.05 * np.arange(q)
    y_full = np.einsum("ip,ip->i", X, B[:, mv0].T) + w
    y_full += np.sqrt(tausq[mv0]) * rng.normal(size=n)
    m = rng.uniform(size=n) < miss
    return np.where(m, np.nan, y_full), y_full, m, X, coords, mv


# measured single-chip HBM copy envelope through this image's axon relay
# (examples/microbench_ops.py, round 2): ~405 GB/s
HBM_ENVELOPE_BYTES_S = 405e9

CONFIGS = {
    1: dict(name="uni_n625_readme", maker=lambda: make_univariate(625),
            keep=1000, burn=1000, thin=2, kwargs={}),
    2: dict(name="uni_n1e4_deep", maker=lambda: make_univariate(10000),
            keep=500, burn=500, thin=2, kwargs={}),
    3: dict(name="biv_n1e5_ag10", maker=lambda: make_multivariate(50000, 2),
            keep=500, burn=1000, thin=2, kwargs={}),
    4: dict(name="q3_misaligned", maker=lambda: make_multivariate(
                20000, 3, imbalance=(0.55, 0.3, 0.15)),
            keep=300, burn=500, thin=2, kwargs=dict(mvbias=1.0)),
    5: dict(name="climate_n1e6", maker=lambda: make_multivariate(
                500000, 2, imbalance=(0.8, 0.2)),
            # climate scale uses the limited (single-parent) tree -- the
            # reference's intended big-n mode; the full-ancestry DAG at depth
            # 9 carries (B, 200, 200) joint factors that exceed single-chip
            # HBM at this n
            # chunk=50: keep=200 in one 200-draw chunk has NO pipelining --
            # the whole 400 MB f16 draw set drains as a tail after the last
            # iteration (same-hour A/B: 101.7 s vs 143.1 s mcmc_time)
            keep=200, burn=300, thin=1, chunk=50,
            kwargs=dict(limited_tree=True)),
}


def run_config(cfg_id, keep=None, burn=None, thin=None, cell_size=25,
               n_chains=1, verbose=False, collect="all", chunk=None,
               const_model=None):
    from spamtree_tpu import spamtree

    c = CONFIGS[cfg_id]
    y, y_full, miss, X, coords, mv = c["maker"]()
    keep = keep or c["keep"]
    burn = burn if burn is not None else c["burn"]
    thin = thin or c["thin"]
    chunk = chunk or c.get("chunk", 200)
    ybar = np.nanmean(y)
    t_setup = time.time()
    out = spamtree(
        y - ybar, X, coords, mv_id=mv,
        cell_size=cell_size,
        mcmc=dict(keep=keep, burn=burn, thin=thin),
        settings=dict(collect=collect, chunk=chunk,
                      const_model=const_model),
        verbose=verbose, precompile=True, n_chains=n_chains,
        **c["kwargs"],
    )
    # burn now runs through the SAME compiled chunked program as keep
    # (rounded up to whole chunks); count the iterations actually executed
    iters = out.get("burn_actual", burn) + keep * thin
    ips = iters / out["mcmc_time"]
    order = out["order"]
    if collect == "summary":
        # device-accumulated posterior mean; chains already averaged in
        y_post = np.asarray(out["yhat_mean"]) + ybar
        if y_post.ndim > 1:  # (C, n) per-chain moments -> pool
            y_post = y_post.mean(axis=0)
    elif n_chains == 1:
        y_post = out["yhat_mcmc"].mean(axis=0) + ybar
    else:
        y_post = out["yhat_mcmc"].mean(axis=(0, 1)) + ybar
    mo = miss[order]
    rmspe = float(np.sqrt(np.mean((y_post[mo] - y_full[order][mo]) ** 2)))
    sd = float(np.nanstd(y_full))
    tflops = 0.0
    bw = 0.0
    # per-chunk XLA cost stats: burn chunks execute the same program, so
    # kept-sample-equivalents = keep + burn_actual/thin exactly
    keep_equiv = keep + out.get("burn_actual", burn) / max(thin, 1)
    if out.get("flops_per_kept_sample"):
        total_flops = out["flops_per_kept_sample"] * keep_equiv
        tflops = total_flops / out["mcmc_time"] / 1e12
    if out.get("bytes_per_kept_sample"):
        # bandwidth-roofline utilization: XLA-counted HBM bytes per second
        # over the measured ~405 GB/s single-chip envelope
        # (examples/microbench_ops.py) -- the honest utilization figure for
        # this bandwidth-bound sampler
        total_bytes = out["bytes_per_kept_sample"] * keep_equiv
        bw = total_bytes / out["mcmc_time"] / HBM_ENVELOPE_BYTES_S
    setup = time.time() - t_setup - out["mcmc_time"]
    sb = dict(out.get("setup_breakdown", {}))
    instrumented = sum(v for k, v in sb.items() if k.endswith("_s"))
    sb["uninstrumented_s"] = round(max(setup - instrumented, 0.0), 2)
    return dict(
        config=c["name"], n=int(len(y)), iters=iters,
        ips=ips, rmspe=rmspe, sd_y=sd,
        accept=out["accept_ratio"], mcmc_time=out["mcmc_time"],
        setup_time=setup,
        setup_breakdown=sb,
        tflops_per_sec=tflops, bandwidth_util=bw, n_chains=n_chains,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3, choices=list(CONFIGS))
    ap.add_argument("--keep", type=int, default=None)
    ap.add_argument("--burn", type=int, default=None)
    ap.add_argument("--thin", type=int, default=None)
    ap.add_argument("--cell_size", type=int, default=25)
    ap.add_argument("--n_chains", type=int, default=1)
    ap.add_argument("--n_per_q", type=int, default=None,
                    help="override config-3 size (legacy flag)")
    ap.add_argument("--verbose", type=int, default=0)
    ap.add_argument("--collect", default="all", choices=["all", "summary"],
                    help="summary = device-side posterior moments only "
                         "(O(1) host traffic per chunk; the large-n mode)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="independent end-to-end trials; the headline value "
                         "is the MEDIAN it/s (this machine shows up to ~30%% "
                         "run-to-run wall variance, BENCH_RESULTS.md)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="kept samples per device->host transfer chunk "
                         "(default: per-config, 200 unless noted); "
                         "larger amortizes per-chunk dispatch (~0.2 s each "
                         "through the relay), smaller tightens interrupt "
                         "granularity")
    ap.add_argument("--const_model", default=None,
                    choices=["true", "false", "hybrid"],
                    help="how the model reaches XLA: constants / arguments "
                         "/ hybrid (big leaves as arguments, small folded); "
                         "default: auto by model size")
    ap.add_argument("--backend", default=None, choices=["cpu"],
                    help="run the SAME code on the XLA:CPU host backend -- "
                         "the measured same-code hardware baseline "
                         "(BENCH_RESULTS.md); default: the platform the "
                         "environment provides (TPU here)")
    args = ap.parse_args()

    if args.backend == "cpu":
        import jax

        # must run before any other backend touch; the sitecustomize pins
        # the axon platform via env, so override through jax.config
        jax.config.update("jax_platforms", "cpu")

    if args.n_per_q is not None:
        CONFIGS[3] = dict(
            name=f"biv_n{2*args.n_per_q}_ag10",
            maker=lambda: make_multivariate(args.n_per_q, 2),
            keep=500, burn=1000, thin=2, kwargs={},
        )

    # Fail FAST with a diagnosable JSON line if the device backend is
    # unreachable (the axon relay has outages during which jax.devices()
    # hangs forever) -- a recorded error beats an opaque driver timeout.
    # The probe runs in a daemon thread; device enumeration is seconds when
    # the backend is healthy, so 180 s is generous.
    import threading

    probe_done = threading.Event()
    probe_err = []

    def _probe():
        import jax

        try:
            jax.devices()
        except BaseException as e:  # record init failures, don't swallow them
            probe_err.append(f"{type(e).__name__}: {e}")
        probe_done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not probe_done.wait(timeout=180.0) or probe_err:
        import os

        print(json.dumps({
            "metric": f"mcmc_iters_per_sec_{CONFIGS[args.config]['name']}",
            "value": 0.0, "unit": "iters/sec", "vs_baseline": 0.0,
            "error": ("device backend init failed: " + probe_err[0]
                      if probe_err else
                      "device backend unreachable: jax.devices() did not "
                      "return within 180 s (axon relay outage?)"),
        }), flush=True)
        # os._exit skips interpreter teardown (the hung backend thread would
        # block a normal exit) -- the flush above is what lands the JSON line
        os._exit(3)

    cm = {"true": True, "false": False, "hybrid": "hybrid",
          None: None}[args.const_model]
    runs = []
    for i in range(max(args.repeats, 1)):
        runs.append(run_config(args.config, keep=args.keep, burn=args.burn,
                               thin=args.thin, cell_size=args.cell_size,
                               n_chains=args.n_chains, verbose=args.verbose,
                               collect=args.collect, chunk=args.chunk,
                               const_model=cm))
    ips_runs = [x["ips"] for x in runs]
    med = int(np.argsort(ips_runs)[len(ips_runs) // 2])
    r = dict(runs[med])  # headline = the median-throughput trial (copy:
    # r must not alias runs[i], the cold/warm fields below would clobber it)
    r["setup_time"] = runs[0]["setup_time"]  # first trial pays cold setup
    r["setup_breakdown"] = runs[0]["setup_breakdown"]
    if len(runs) > 1:
        # later trials reuse warm caches (persistent XLA cache + staged
        # host buffers): the realistic repeat-user setup cost
        wi = 1 + int(np.argmin([x["setup_time"] for x in runs[1:]]))
        r["setup_time_warm"] = runs[wi]["setup_time"]
        r["setup_breakdown_warm"] = runs[wi]["setup_breakdown"]

    # No measured CPU baseline exists (reference publishes none; R absent
    # here).  Extrapolate the CRAN bound: >=120 it/s at n=225 on 1 thread,
    # O(n) per-iteration cost.  vs_baseline = conservative (ideal 10-thread
    # scaling assumed for the CPU); vs_cpu_1thread_est = optimistic end.
    cpu_1t_ips = 120.0 * (225.0 / r["n"])
    print(json.dumps({
        "metric": f"mcmc_iters_per_sec_{r['config']}",
        "value": round(r["ips"], 3),
        "unit": "iters/sec",
        "vs_baseline": round(r["ips"] / (10.0 * cpu_1t_ips), 3),
        "baseline_note": "estimated ideal-10-thread CPU extrapolation of the "
                         "CRAN <5s bound; no measured reference baseline",
        "vs_cpu_1thread_est": round(r["ips"] / cpu_1t_ips, 3),
        "rmspe": round(r["rmspe"], 4),
        "sd_y": round(r["sd_y"], 3),
        "n": r["n"],
        "iters": r["iters"],
        "accept": round(r["accept"], 3),
        "mcmc_time_s": round(r["mcmc_time"], 2),
        "setup_time_s": round(r["setup_time"], 2),
        **({"setup_time_warm_s": round(r["setup_time_warm"], 2)}
           if "setup_time_warm" in r else {}),
        "setup_breakdown_s": r["setup_breakdown"],
        **({"setup_breakdown_warm_s": r["setup_breakdown_warm"]}
           if "setup_breakdown_warm" in r else {}),
        "repeats": len(runs),
        "ips_runs": [round(v, 3) for v in ips_runs],
        "ips_min": round(min(ips_runs), 3),
        "ips_max": round(max(ips_runs), 3),
        "tflops_per_sec": round(r["tflops_per_sec"], 4),
        "bandwidth_util": round(r["bandwidth_util"], 4),
        # n_chains > 1 runs independent chains vmapped in ONE program (each
        # "iteration" advances every chain), so aggregate sampling
        # throughput is ips * n_chains
        **({"n_chains": r["n_chains"],
            "agg_chain_iters_per_sec": round(r["ips"] * r["n_chains"], 3)}
           if r["n_chains"] > 1 else {}),
    }))


if __name__ == "__main__":
    main()
