"""--tpu-mesh N: the production call path sharded over an N-device
genome mesh (parallel/mesh.py build_sharded_assign) must be
byte-identical to the host path — the raw-signature halo exchange and
two-window exactly-once ownership make shard seams exact, and the host
materialization (merge_inner -> resplit -> call_from) is shared with
the single-device --tpu-call path.

Overflow semantics: a cluster wider than the halo W retries with
doubled W on the same executable; when the bound still fails the
device path raises and the task falls back to the exact host sweep
(run_mesh_assign / Task._iter_clusters)."""
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from sniffles_tpu.config import SnifflesConfig  # noqa: E402
from sniffles_tpu.leads import Lead, LeadProvider  # noqa: E402
from sniffles_tpu.sim import PlantedSV, write_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SNIFFLES_TPU_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    if env_extra:
        env.update(env_extra)
    return subprocess.run([sys.executable, "-m", "sniffles_tpu.cli"] + args,
                          capture_output=True, text=True, env=env, cwd=str(cwd),
                          timeout=600)


def read_calls(vcf_path):
    with open(vcf_path) as f:
        return [l for l in f if not l.startswith("#")]


def _sim(tmp_path):
    svs = [PlantedSV(pos=p, svtype=t, svlen=ln)
           for p, t, ln in [(30_000, "DEL", 120), (60_000, "INS", 150),
                            (90_000, "DEL", 500), (120_000, "INS", 80),
                            (150_000, "DEL", 2000), (180_000, "DUP", 900)]]
    return write_dataset(str(tmp_path), ref_len=230_000, depth=24,
                         read_len=12_000, seed=11, svs=svs)


def test_mesh_cli_matches_host(tmp_path):
    bam, _ = _sim(tmp_path)
    host_out = tmp_path / "host.vcf"
    mesh_out = tmp_path / "mesh.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "0"], tmp_path)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", bam, "--vcf", str(mesh_out), "--threads", "0",
                  "--tpu-call", "--tpu-mesh", "8"], tmp_path,
                 env_extra={"SNIFFLES_TPU_REQUIRE_DEVICE": "1"})
    assert r2.returncode == 0, r2.stderr
    assert "falling back" not in r2.stderr
    assert read_calls(host_out) == read_calls(mesh_out)


def test_mesh_cli_threaded_matches_host(tmp_path):
    """Workers ship mesh payloads to the parent device service."""
    bam, _ = _sim(tmp_path)
    host_out = tmp_path / "host.vcf"
    mesh_out = tmp_path / "mesh.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "2"], tmp_path)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", bam, "--vcf", str(mesh_out), "--threads", "2",
                  "--tpu-call", "--tpu-mesh", "8"], tmp_path,
                 env_extra={"SNIFFLES_TPU_REQUIRE_DEVICE": "1"})
    assert r2.returncode == 0, r2.stderr
    assert "falling back" not in r2.stderr
    assert read_calls(host_out) == read_calls(mesh_out)


# --------------------------------------------------------------------------
# halo overflow: wide-cluster retry and exhausted-retry fallback


def _wide_cluster_provider(config, span_bp, far_pos=800_000):
    """Contiguous occupied 100bp bins (>= dev_min_leads_cluster leads
    each) merge into ONE stage-1 cluster: the inter-bin gap is 0, which
    always satisfies the stdev-scaled criterion. span_bp controls the
    cluster's width. A far-away normal cluster stretches the task span
    so mesh shard windows stay wide (the halo W retry ladder is bounded
    by window/2)."""
    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize

    i = 0

    def add(pos, svlen=-200):
        nonlocal i
        ld = Lead(read_id=i, read_qname=f"r{i}", contig="chr1",
                  ref_start=pos, ref_end=pos, qry_start=0, qry_end=0,
                  strand="+", mapq=40, nm=0.0, source="INLINE",
                  svtype="DEL", svlen=svlen)
        provider.record_lead(ld, pos // binsize * binsize)
        i += 1

    for bin_start in range(20_000, 20_000 + span_bp, binsize):
        for off in (5, 35, 65):
            add(bin_start + off)
    for k in range(4):   # isolated normal cluster far to the right
        add(far_pos + k, svlen=-500)
    provider.start = 0
    provider.end = 1_000_000
    return provider


@pytest.fixture
def config():
    cfg = SnifflesConfig("--input", "x.bam", "--vcf", "y.vcf")
    cfg.tpu_call = True
    return cfg


def _cluster_keyset(clusters):
    return sorted((c.svtype, tuple(sorted(ld.read_qname for ld in c.leads)))
                  for c in clusters)


def test_mesh_wide_cluster_retries_with_doubled_halo(config):
    """A 14kb cluster exceeds W=5000; the retry ladder (10k, 20k) must
    recover it exactly — mesh output == single-device output."""
    from sniffles_tpu.parallel.device_call import device_clusters

    provider = _wide_cluster_provider(config, span_bp=14_000)
    single = list(device_clusters(provider, config, None))

    provider2 = _wide_cluster_provider(config, span_bp=14_000)
    config.tpu_mesh = 8
    try:
        mesh = list(device_clusters(provider2, config, None))
    finally:
        config.tpu_mesh = 0
    assert _cluster_keyset(mesh) == _cluster_keyset(single)
    assert len(mesh) >= 1


def test_mesh_overflow_exhausted_raises(config):
    """A cluster wider than the last-retry W raises so the task-level
    caller (Task._iter_clusters) falls back to the exact host path."""
    from sniffles_tpu.parallel.device_call import (device_clusters,
                                                   MESH_HALO_BP,
                                                   MESH_HALO_RETRIES)

    max_w = MESH_HALO_BP * (2 ** (MESH_HALO_RETRIES - 1))
    # far_pos=160k keeps shard windows ~18kb, so the 50kb cluster crosses
    # several shard boundaries and no admissible W (2W <= window) covers it
    provider = _wide_cluster_provider(config, span_bp=2 * max_w + 10_000,
                                      far_pos=160_000)
    config.tpu_mesh = 8
    try:
        with pytest.raises(RuntimeError, match="halo overflow"):
            list(device_clusters(provider, config, None))
    finally:
        config.tpu_mesh = 0


def test_mesh_overflow_task_falls_back_to_host(tmp_path):
    """End-to-end: with an overflowing device path the CLI still emits
    the host-exact VCF (silent fallback allowed when REQUIRE_DEVICE is
    unset)."""
    from unittest import mock

    bam, _ = _sim(tmp_path)
    host_out = tmp_path / "host.vcf"
    mesh_out = tmp_path / "mesh.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "0"], tmp_path)
    assert r1.returncode == 0, r1.stderr
    # zero retries => any halo pressure raises => host fallback
    r2 = run_cli(["--input", bam, "--vcf", str(mesh_out), "--threads", "0",
                  "--tpu-call", "--tpu-mesh", "8"], tmp_path,
                 env_extra={"SNIFFLES_TPU_MESH_FORCE_OVERFLOW": "1"})
    assert r2.returncode == 0, r2.stderr
    assert read_calls(host_out) == read_calls(mesh_out)


# --------------------------------------------------------------------------
# ADVICE r3 regressions: per-svtype head freeze + sender-side span overflow


def _chain_provider(config, add_specs):
    """Provider from explicit (pos, svtype, svlen) lead specs."""
    provider = LeadProvider(config, 0, "chr1")
    binsize = config.cluster_binsize
    for i, (pos, svtype, svlen) in enumerate(add_specs):
        ld = Lead(read_id=i, read_qname=f"r{i}", contig="chr1",
                  ref_start=pos, ref_end=pos, qry_start=0, qry_end=0,
                  strand="+", mapq=40, nm=0.0, source="INLINE",
                  svtype=svtype, svlen=svlen)
        provider.record_lead(ld, pos // binsize * binsize)
    provider.start = 0
    provider.end = 1_000_000
    return provider


def _head_freeze_specs():
    """A DEL head chain where the host sweep's head-boundary freeze
    matters, placed so DEL's task-globally FIRST element is NOT in
    shard 0 (an INS cluster occupies the low coordinates): c0 spread
    (sd~50), one-bin gap to tight c1, adjacent spread c2 — pristine
    c0-c1 fails (min sd is c1's ~0.5), c1+c2 merge inflates the pair
    sd, and an unfrozen relaxation closure would then merge c0 as well
    while the sweep never revisits the head boundary."""
    specs = [(20_000 + o, "INS", 150) for o in (0, 1, 2, 3)]
    specs += [(600_000 + o, "DEL", -200) for o in (0, 0, 99, 99)]       # c0 spread
    specs += [(600_250 + o, "DEL", -200) for o in (0, 0, 1, 1)]         # c1 tight
    specs += [(600_300 + o, "DEL", -200) for o in (0, 0, 99, 99)]       # c2 spread
    specs += [(900_000 + o, "DEL", -500) for o in (0, 1, 2, 3)]         # span stretch
    return specs


def test_mesh_head_freeze_applies_off_shard_zero(config):
    """The head freeze must fire in whichever shard holds a svtype's
    task-globally first element (here DEL's head lands in a middle
    shard of the 8-mesh), keeping mesh == single-device."""
    from sniffles_tpu.parallel.device_call import device_clusters

    single = list(device_clusters(_chain_provider(config, _head_freeze_specs()),
                                  config, None))
    config.tpu_mesh = 8
    try:
        mesh = list(device_clusters(_chain_provider(config, _head_freeze_specs()),
                                    config, None))
    finally:
        config.tpu_mesh = 0
    assert _cluster_keyset(mesh) == _cluster_keyset(single)
    # guard against vacuity: the single-device path must actually freeze
    # the head — c0 (reads r4..r7) stays a separate cluster while c1+c2
    # merge; an unfrozen closure would fold all three together
    keys = _cluster_keyset(single)
    assert ("DEL", ("r10", "r11", "r12", "r13", "r14", "r15", "r8", "r9")) in keys
    assert ("DEL", ("r4", "r5", "r6", "r7")) in keys


def _sender_span_specs():
    """A cluster chain that spans > W and ends inside the sender's last
    W: the sender suppresses it (right neighbor owns it), and at W=5000
    the receiver's 2W-truncated halo view re-clusters into a legal-
    looking fragment (an 800bp interior gap that only merges when the
    full left run's stdev is visible) — the ADVICE r3 silent-truncation
    scenario. The sender-side span check must flag it so the doubled-W
    retry restores the exact membership."""
    specs = [(500 + o, "DEL", -300) for o in (0, 1, 2, 3)]
    # left run 28.0k-31.0k: contiguous 100bp bins, 3 leads each
    for bin_start in range(28_000, 31_100, 100):
        for off in (5, 35, 65):
            specs.append((bin_start + off, "DEL", -200))
    # 1.2kb gap, then right run 32.3k-36.4k (the gap merges only when
    # the full 3kb left run's stdev is visible; the receiver's
    # truncated 1kb view fails the criterion and splits legal-looking)
    for bin_start in range(32_300, 36_400, 100):
        for off in (5, 35, 65):
            specs.append((bin_start + off, "DEL", -200))
    specs += [(79_500 + o, "DEL", -500) for o in (0, 1, 2, 3)]
    return specs


def test_mesh_sender_span_overflow_forces_retry(config):
    """Pre-fix, the truncated receiver fragment passed the span check
    and --tpu-mesh silently emitted wrong cluster membership; the
    sender-side check now forces the retry and mesh == single-device."""
    from sniffles_tpu.parallel.device_call import device_clusters

    single = list(device_clusters(_chain_provider(config, _sender_span_specs()),
                                  config, None))
    config.tpu_mesh = 2
    try:
        mesh = list(device_clusters(_chain_provider(config, _sender_span_specs()),
                                    config, None))
    finally:
        config.tpu_mesh = 0
    assert _cluster_keyset(mesh) == _cluster_keyset(single)
    # vacuity guard: on the full view the 1.2kb gap merges, so the two
    # runs form ONE 216-lead cluster spanning ~8.4kb (> W=5000); the
    # pre-fix mesh silently dropped the 93-lead left run (probe:
    # owned_total 131 of 224, halo_overflow all-False)
    big = [k for k in _cluster_keyset(single) if len(k[1]) > 200]
    assert len(big) == 1


def test_mesh_cli_nondefault_binsize_matches_host(tmp_path):
    """--cluster-binsize 400 through the mesh path: the truncation-edge
    sentinel scales with the configured bin (mesh.py), so non-default
    binsizes keep the receiver-side overflow guarantee — output must
    stay byte-identical to the host path under the same flag."""
    bam, _ = _sim(tmp_path)
    host_out = tmp_path / "host.vcf"
    mesh_out = tmp_path / "mesh.vcf"
    r1 = run_cli(["--input", bam, "--vcf", str(host_out), "--threads", "0",
                  "--cluster-binsize", "400"], tmp_path)
    assert r1.returncode == 0, r1.stderr
    r2 = run_cli(["--input", bam, "--vcf", str(mesh_out), "--threads", "0",
                  "--cluster-binsize", "400",
                  "--tpu-call", "--tpu-mesh", "8"], tmp_path,
                 env_extra={"SNIFFLES_TPU_REQUIRE_DEVICE": "1"})
    assert r2.returncode == 0, r2.stderr
    assert read_calls(host_out) == read_calls(mesh_out)
    assert read_calls(host_out)  # non-empty comparison


def test_combine_step_sentinel_scales_with_binsize():
    """build_sharded_combine_step: a group whose pos_min lands between
    100bp and 400bp past the receiver's truncation edge must flag
    overflow at binsize=400 (edge-zone contact) but not at binsize=100,
    on identical inputs (mesh.py receiver-side sentinel)."""
    import jax.numpy as jnp

    from sniffles_tpu.parallel.mesh import (build_sharded_combine_step,
                                            make_genome_mesh)

    n_dev = 8
    per_dev = 64
    window = 50_000
    W = 2000
    mesh8 = make_genome_mesh(8)
    total = per_dev * n_dev

    pos = np.zeros(total, dtype=np.int32)
    svlen = np.zeros(total, dtype=np.int32)
    valid = np.zeros(total, dtype=bool)
    slot = [s * per_dev for s in range(n_dev)]

    def add(shard, p, ln=400):
        i = slot[shard]
        pos[i] = p
        svlen[i] = ln
        valid[i] = True
        slot[shard] += 1

    # a chain group in shard 0's tail: pos_min = 46_200 sits 200bp past
    # shard 1's truncation edge (my_start - 2W = 46_000); pos_max =
    # 48_100 >= my_start - W keeps it owned by shard 1; span 1900 <= W
    for p in range(46_200, 48_101, 500):
        add(0, p)
    add(0, 48_100)
    # unrelated well-interior groups on every shard
    for s in range(n_dev):
        for p in (s * window + 10_000, s * window + 30_000):
            add(s, p)
            add(s, p + 40)

    cand = {
        "pos": pos, "svlen": svlen,
        "svtype": np.zeros(total, dtype=np.int32),
        "sample_id": np.zeros(total, dtype=np.int32),
        "support": np.full(total, 5, dtype=np.int32),
        "qc": np.ones(total, dtype=bool), "valid": valid,
    }
    offs = jnp.arange(n_dev, dtype=jnp.int32) * window
    wlen = jnp.full((n_dev,), window, dtype=jnp.int32)
    halo_w = jnp.full((n_dev,), W, dtype=jnp.int32)
    jcand = {k: jnp.asarray(v) for k, v in cand.items()}

    out100 = build_sharded_combine_step(mesh8, halo_slots=64, binsize=100)(
        jcand, offs, wlen, halo_w)
    assert not bool(np.asarray(out100["halo_overflow"]).any())

    out400 = build_sharded_combine_step(mesh8, halo_slots=64, binsize=400)(
        jcand, offs, wlen, halo_w)
    assert bool(np.asarray(out400["halo_overflow"]).any())
