"""Predicted multi-host scaling efficiency (round 5, VERDICT r4 #7).

Real >=2-host hardware is unavailable here (one chip via a tunnel), so this
model puts a CHECKABLE number next to BASELINE.md's ">=90% scaling to 2
hosts" target: measured single-chip step time + measured per-step exchange
payloads (counted from the real model/schema on a synthetic batch sample)
+ documented interconnect rate assumptions -> predicted efficiency at
1/2/4/8 hosts. Every input and every formula prints so the arithmetic can
be re-derived by hand.

Frame: WEAK SCALING at the flagship config (DeepFM scaled, per-chip batch
8192, K=64, packed [V, 65] table) — the standard frame for recommender
throughput. Mesh ('data', 'model'): tables row-sharded over 'model' (m=4),
batch over both axes (the dedup EP layout), towers data-parallel.

Interconnect assumptions (documented public numbers for TPU v5e; the
jax-ml scaling book's hardware table):
  - ICI: 4 links/chip (2D torus), ~45 GB/s one-way per link. A GSPMD mesh
    axis maps to one torus dimension -> 2 links (+/-) = 90 GB/s per chip
    along an axis.
  - DCN (cross-slice only): ~25 GB/s egress per host (8 chips/host).
  - Hosts 1-8 (8-64 chips) fit ONE v5e pod slice, so all collectives ride
    ICI; the DCN row models the pessimistic multi-slice layout where the
    'data' axis crosses slices (EP stays in-slice by construction).

Collective cost formulas (bidirectional ring along the mesh axis; scaling
book recipes):
  all_to_all:  T = V * m / (8 * bw_link)      (V = egress bytes per chip;
               avg hop distance m/4 over 2m directed links)
  all_reduce:  T = 2 * G * (n-1)/n / bw_axis  (G = payload bytes;
               reduce-scatter + all-gather, bw_axis = 2 links)

Run: python -m benchmarks.scaling_model [--step-ms 1.491]
"""

import argparse
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ICI_LINK = 45e9        # B/s one-way per ICI link (v5e)
ICI_AXIS = 2 * ICI_LINK  # 2 links along one torus axis
DCN_HOST = 25e9        # B/s egress per host
CHIPS_PER_HOST = 8


def measured_payloads(batch_per_chip=8192, k=64, m=4, sample_batches=8):
    """Count the real per-step exchange payloads from the real schema.

    Returns (unique_rows_per_chip, dedup_a2a_bytes_per_chip,
    dense_grad_bytes) — all MEASURED from the code/schema, not assumed.
    """
    from bench import random_superbatch, scaled_feature_set

    fs = scaled_feature_set()
    sb = random_superbatch(fs, sample_batches, batch_per_chip)
    uniq = np.mean([
        np.unique(sb["cat_ids"][i]).shape[0] for i in range(sample_batches)
    ])

    # dedup EP exchange (parallel/embedding_ep.make_ep_lookup_dedup): per
    # chip per step, ids ride out (int32) and [K+1] rows ride back in the
    # wire dtype (bf16), then the same row bytes return as cotangents in the
    # backward. Egress per chip ~= uniques * bytes (requests are ~uniques/m
    # to each of m peers).
    row_bytes_bf16 = (k + 1) * 2
    id_bytes = 4
    a2a_fwd = uniq * (row_bytes_bf16 + id_bytes)
    a2a_bwd = uniq * row_bytes_bf16
    a2a = a2a_fwd + a2a_bwd

    # dense (non-table) gradient bytes for the DP all-reduce: count the
    # tower params exactly as the model builds them (f32 grads).
    f = fs.num_fields
    d_in = f * k
    hidden = (256, 128)
    n_params = 0
    for h in (*hidden, 1):
        n_params += d_in * h + h  # W + b per layer
        d_in = h
    n_params += 1  # linear tower bias (w is fused into the table)
    dense_grad = n_params * 4
    return uniq, a2a, dense_grad, n_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=1.491,
                    help="certified single-chip step time (bench.py v3)")
    ap.add_argument("--m", type=int, default=4, help="model (EP) shards")
    args = ap.parse_args()

    uniq, a2a, dense_grad, n_params = measured_payloads(m=args.m)
    t_comp = args.step_ms * 1e-3
    m = args.m

    log(f"measured inputs: uniques/chip/step = {uniq:,.0f} "
        f"(batch 8192 x 26 fields, scaled schema)")
    log(f"  dedup a2a egress/chip/step = {a2a/1e6:.2f} MB "
        f"(ids out + bf16 [65]-rows back + bf16 cotangents out)")
    log(f"  dense tower grads = {dense_grad/1e6:.2f} MB ({n_params:,} params f32)")
    log(f"  single-chip step = {1e3*t_comp:.3f} ms (bench.py v3 certified)")
    log("")
    hdr = (f"{'hosts':>5} {'chips':>6} {'t_a2a':>8} {'t_ar(ICI)':>10} "
           f"{'eff(no-ovl)':>12} {'eff(ovl)':>9} {'t_ar(DCN)':>10} {'eff(DCN,no-ovl)':>16}")
    log(hdr)
    rows = []
    for hosts in (1, 2, 4, 8):
        n = hosts * CHIPS_PER_HOST
        # EP all_to_all over the 'model' axis (always ICI, in-slice)
        t_a2a = a2a * m / (8 * ICI_LINK)
        # DP all-reduce of dense grads over the 'data' axis
        n_data = n // m
        t_ar_ici = 2 * dense_grad * (n_data - 1) / n_data / ICI_AXIS
        # pessimistic multi-slice: data axis over DCN, 8 chips share a host NIC
        t_ar_dcn = 2 * dense_grad * (n_data - 1) / n_data / (DCN_HOST / CHIPS_PER_HOST)
        comm = t_a2a + t_ar_ici
        eff_no = t_comp / (t_comp + comm)
        eff_ovl = min(1.0, t_comp / max(t_comp, comm))
        comm_dcn = t_a2a + t_ar_dcn
        eff_dcn = t_comp / (t_comp + comm_dcn)
        log(f"{hosts:>5} {n:>6} {1e6*t_a2a:>7.0f}u {1e6*t_ar_ici:>9.0f}u "
            f"{100*eff_no:>11.1f}% {100*eff_ovl:>8.1f}% {1e6*t_ar_dcn:>9.0f}u "
            f"{100*eff_dcn:>15.1f}%")
        rows.append((hosts, n, eff_no, eff_ovl, eff_dcn))
    log("")
    log("formulas: t_a2a = V*m/(8*45e9); t_ar = 2G(n_d-1)/n_d / bw_axis;")
    log("  eff(no-ovl) = t_comp/(t_comp + t_comm); eff(ovl) assumes full")
    log("  compute/comm overlap (XLA latency hiding), = t_comp/max(t_comp, t_comm).")
    two_host = rows[1]
    verdict = "MEETS" if two_host[2] >= 0.90 else "MISSES"
    log(f"2-host prediction: {100*two_host[2]:.1f}% (no-overlap lower bound) / "
        f"{100*two_host[3]:.1f}% (overlapped) -> {verdict} the >=90% target "
        f"even without overlap")
    return rows


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the shared TPU
    main()
