"""CLI driver, organized as a pipeline of stages: mode detection, input
validation, output opening, task planning, worker-pool execution, and
ordered result emission (reference: src/sniffles/sniffles:64-650).
"""
from __future__ import annotations

import logging.config
import logging
import math
import multiprocessing
import os
import time
import sys
from collections import deque
from typing import Optional

from sniffles_tpu import util
from sniffles_tpu.config import SnifflesConfig

log = logging.getLogger('sniffles_tpu.main')


# --------------------------------------------------------------------------
# Stage 1: mode detection + input validation


def _detect_mode(config: SnifflesConfig) -> list[str]:
    """Choose the run mode from the input file extensions; returns the
    lowercased extension list (reference: sniffles:98-129)."""
    exts = [name.rsplit(".", 1)[-1].lower() for name in config.input]
    distinct = set(exts)
    if len(distinct) > 1:
        util.fatal_error_main(
            "Please specify either: A single .bam/.cram file - OR - one or more .snf files - OR "
            "- a single .tsv file containing a list of .snf files and optional sample ids as "
            f"input. (supplied were: {list(distinct)})")

    if distinct & {"bam", "cram"}:
        if len(config.input) > 1:
            util.fatal_error_main("Please specify max 1 .bam/.cram file as input")
        config.input = config.input[0]
        config.mode = "genotype_vcf" if config.genotype_vcf is not None else "call_sample"
        config.input_is_cram = "cram" in distinct
        config.input_mode = "rc" if config.input_is_cram else "rb"
    elif distinct & {"snf", "tsv"}:
        config.mode = "combine"
    else:
        util.fatal_error_main(
            "Failed to determine run mode from input. Please specify either: A single .bam file "
            "- OR - one or more .snf files - OR - a single .tsv file as input.")

    if config.mode != "call_sample" and config.snf is not None:
        util.fatal_error_main(f"--snf cannot be used with run mode {config.mode}")
    if config.vcf is None and config.snf is None:
        util.fatal_error_main("Please specify at least one of: --vcf or --snf for output")

    if config.mode == "call_sample":
        config.sample_ids_vcf = [(0, config.sample_id or "SAMPLE")]
    elif config.mode == "combine":
        config.sample_id = None
        config.sample_ids_vcf = [(0, "CONSENSUS")] if config.combine_consensus else []
    return exts


def _open_alignments(config: SnifflesConfig):
    """Open + index-check the BAM/CRAM input (reference: sniffles:170-186)."""
    from sniffles_tpu.io.bam import AlignmentFile
    log.info(f"Opening for reading: {config.input}")
    try:
        bam_in = AlignmentFile(config.input, config.input_mode)
    except FileNotFoundError:
        util.fatal_error_main(f"Input file '{config.input}' not found.")
    except (ValueError, NotImplementedError) as e:
        util.fatal_error_main(f"Unable to open input file '{config.input}': {e}")
    if not bam_in.check_index():
        util.fatal_error_main(
            f"Unable to load index for input file '{config.input}'. Please verify that your "
            f"input file is sorted + indexed.")
    return bam_in


def _load_genotype_targets(config: SnifflesConfig):
    """Parse the --genotype-vcf input for force calling
    (reference: sniffles:191-214)."""
    from sniffles_tpu.io import vcf as vcfmod
    ext = os.path.splitext(config.genotype_vcf)[1].lower()
    if ext == ".gz":
        import gzip
        handle = gzip.open(config.genotype_vcf, "rt")
    elif ext == ".vcf":
        handle = open(config.genotype_vcf, "r")
    else:
        util.fatal_error_main("Expected a .vcf or .vcf.gz file for --genotype-vcf")
    vcf_in = vcfmod.VCF(config, handle)

    lineindex_order = []
    by_lineindex = {}
    by_contig = {}
    for svc in vcf_in.read_svs_iter():
        assert svc.raw_vcf_line_index not in by_lineindex
        lineindex_order.append(svc.raw_vcf_line_index)
        by_lineindex[svc.raw_vcf_line_index] = svc
        by_contig.setdefault(svc.contig, []).append(svc)
    log.info(f"Read {len(by_lineindex)} SVs to be genotyped")
    return vcf_in, lineindex_order, by_contig


# --------------------------------------------------------------------------
# Stage 2: outputs


def _guard_overwrite(path: str, config, what: str = "Output file"):
    if os.path.exists(path) and not config.allow_overwrite:
        util.fatal_error_main(f"{what} '{path}' already exists! Use "
                              f"--allow-overwrite to ignore this check.")


def _open_vcf_out(config: SnifflesConfig):
    from sniffles_tpu.io import vcf as vcfmod
    _guard_overwrite(config.vcf, config)
    if config.vcf_output_bgz and not config.sort:
        util.fatal_error_main(".gz (bgzip) output is only supported with sorting enabled")
    parent_dir = os.path.dirname(os.path.abspath(config.uncompressed_vcf_name))
    if not os.path.exists(parent_dir):
        util.fatal_error_main(f"Directory {parent_dir} does not exist.")

    vcf_out = vcfmod.VCF(config, open(config.uncompressed_vcf_name, "w"))
    if config.mode in ("call_sample", "combine"):
        vcf_out.open_reference()
    log.info(f"Opening for writing: {config.vcf}")
    return vcf_out


def _open_snf_out(config: SnifflesConfig):
    from sniffles_tpu.io import snf as snfmod
    _guard_overwrite(config.snf, config)
    return snfmod.SNFile(config, open(config.snf, "wb"))


def _open_psnf_out(config: SnifflesConfig):
    name = config.dev_population_snf
    if os.path.exists(name) and not config.allow_overwrite:
        util.fatal_error_main(f'Population SNF {name} already exists!')
    from sniffles_tpu.io.snfp import PopulationSNF
    return PopulationSNF(config, open(name, 'wb'))


# --------------------------------------------------------------------------
# Stage 3: task planning


def _plan_interval_tasks(config, bam_in, tandem_repeats, genotype_contig_svs):
    """Split each kept contig into read-count-balanced interval tasks
    (reference: sniffles:289-358).  Returns (tasks, contigs,
    contig_lengths)."""
    from sniffles_tpu.pipeline import tasks as taskmod
    task_class = (taskmod.GenotypeTask if config.mode == "genotype_vcf"
                  else taskmod.CallTask)

    total_mapped = bam_in.mapped
    single_task_per_contig = ((config.threads == 1 and not config.low_memory)
                              or config.task_count_multiplier == 0)
    if single_task_per_contig:
        task_max_reads = total_mapped
    else:
        task_max_reads = max(1, math.floor(
            total_mapped / (config.threads * config.task_count_multiplier)))

    config.task_read_id_offset_mult = (
        10 ** 9 if total_mapped == 0
        else 10 ** math.ceil(math.log(total_mapped) + 1))

    tasks = deque()
    contigs = []
    contig_lengths = []
    task_id = 0
    tr_annotated = 0
    for stat in bam_in.get_index_statistics():
        contig = str(stat.contig)
        length = bam_in.get_reference_length(contig)
        if not util.should_process_contig(contig, length, config):
            continue

        contigs.append(contig)
        contig_lengths.append((contig, length))
        tr_annotated += contig in tandem_repeats

        pieces = 1 if task_max_reads == 0 else max(
            1, math.ceil(stat.mapped / float(task_max_reads)))
        step = math.floor(length / float(pieces))
        targets = genotype_contig_svs.get(contig, []) if genotype_contig_svs is not None else None

        lo = 0
        while lo < length - 1:
            hi = min(length - 1, lo + step)
            window_svs = ([t for t in targets if lo <= t.pos < hi]
                          if targets is not None else None)
            tasks.append(task_class(
                id=task_id, contig=contig, start=lo, end=hi,
                assigned_process_id=None,
                tandem_repeats=tandem_repeats.get(contig),
                genotype_svs=window_svs, sv_id=0, config=config,
                regions=config.regions_by_contig.get(contig)))
            lo += step
            task_id += 1

    config.contig_lengths = contig_lengths
    if config.tandem_repeats is not None and tr_annotated < len(contig_lengths):
        if tr_annotated == 0:
            util.fatal_error_main(
                "A tandem repeat annotations file was provided, but no matching annotations "
                "were found for any contig in the sample input file.")
    return tasks, contigs, contig_lengths


def _resolve_snf_inputs(config, exts) -> list[tuple[str, Optional[str]]]:
    """The .snf file list, either given directly or via a .tsv sample
    sheet (reference: sniffles:380-404)."""
    if len(config.input) == 1 and exts[0] == "tsv":
        pairs = []
        with open(config.input[0], "r") as sheet:
            for line_no, line in enumerate(sheet.readlines()):
                row = line.strip()
                if not row or row.startswith("#"):
                    continue
                cols = row.split("\t")
                if len(cols) in (1, 2):
                    pairs.append((cols[0], cols[1] if len(cols) == 2 else None))
                else:
                    util.fatal_error_main(
                        f"Invalid sample list .tsv: {config.input[0]}: Line {line_no + 1}")
        return pairs
    if exts[0] == "snf":
        return [(item, None) for item in config.input]
    util.fatal_error_main("Failed to determine .snf files to be combined.")


def _plan_combine_tasks(config, exts, start_task_id):
    """Validate input SNFs, register sample ids, and scatter per-contig
    combine tasks (reference: sniffles:406-483)."""
    from sniffles_tpu.io import snf as snfmod
    from sniffles_tpu.pipeline import tasks as taskmod

    config.snf_input_info = []
    inputs = _resolve_snf_inputs(config, exts)

    contig_lengths = []
    for internal_id, (filename, sample_id) in enumerate(inputs):
        snf_in = snfmod.SNFile(config, open(filename, "rb"), filename=filename)
        snf_in.read_header()
        snf_config = snf_in.header["config"]
        # NB like the reference, the last input's contig table wins
        contig_lengths = snf_config["contig_lengths"]
        if not config.dev_skip_snf_validation:
            if config.snf_block_size != snf_config["snf_block_size"]:
                util.fatal_error_main(f"SNF block size differs for {filename}")
            if config.snf_format_version != snf_config["snf_format_version"]:
                util.fatal_error_main(f"SNF format version for {filename} is not supported")
        if sample_id is None:
            sample_id = (snf_config["sample_id"] if snf_config["sample_id"] is not None
                         else os.path.splitext(os.path.basename(filename))[0])
        config.snf_input_info.append({"internal_id": internal_id, "sample_id": sample_id,
                                      "filename": filename})
        snf_in.close()
        log.info(f"    {filename} (sample ID in output VCF='{sample_id}')")

    if not config.combine_consensus:
        config.sample_ids_vcf.extend(
            (info["internal_id"], info["sample_id"]) for info in config.snf_input_info)

    if wanted := (config.contig or config.regions_by_contig):
        contig_lengths = [(name, length) for name, length in contig_lengths
                          if name in wanted]

    result_class = None
    if len(inputs) > config.combine_max_inmemory_results:
        from sniffles_tpu.pipeline.result import CombineResultTmpFile
        result_class = CombineResultTmpFile
        if config.sort and config.vcf_output_bgz:
            config.vcf = config.uncompressed_vcf_name
            config.no_sort = True
    if config.dev_population_snf:
        from sniffles_tpu.pipeline.result import CombineResultTmpFilePopulationSNF
        result_class = CombineResultTmpFilePopulationSNF

    tasks = deque()
    task_id = start_task_id
    for contig, length in contig_lengths:
        combine = taskmod.CombineTask(
            id=task_id, contig=contig, start=0, end=length - 1,
            assigned_process_id=None, sv_id=0, config=config,
            result_class=result_class,
            regions=config.regions_by_contig.get(contig))
        tasks.extend(combine.scatter())
        task_id = tasks[-1].id + 1
    return tasks, contig_lengths


# --------------------------------------------------------------------------
# Stage 4: execution + emission


def _run_pool(config, tasks, processes, monitor):
    """Run the worker pool (or the inline parent worker for --threads 0)
    to completion (reference: sniffles:495-542)."""
    from sniffles_tpu.pipeline import runtime
    from sniffles_tpu.parallel import device_daemon
    device_server = None
    # a configured device daemon already holds the chip claim; this
    # process must then never claim it itself (two claimants queue on
    # the single chip)
    have_daemon = bool(os.environ.get(device_daemon.ENV_SOCKET)
                       and os.path.exists(os.environ[device_daemon.ENV_SOCKET]))
    if config.threads:
        if ((getattr(config, "tpu_call", False) or getattr(config, "tpu_combine", False))
                and not have_daemon):
            # one shared TPU client in the parent; workers reach it over
            # their task pipes (parallel/device_service.py). Created BEFORE
            # any JAX import so worker forks stay clean.
            from sniffles_tpu.parallel.device_service import DeviceServer
            device_server = DeviceServer()
        for pnum in range(config.threads):
            processes.append(runtime.SnifflesWorker(
                process_id=pnum, config=config, tasks=tasks,
                recycle_hint=monitor, peers=processes,
                device_server=device_server))
    else:
        processes.append(runtime.SnifflesParentWorker(config=config, tasks=tasks))
        if getattr(config, "tpu_call", False) and not have_daemon:
            # inline (--threads 0) tasks use in-process JAX; claim the
            # chip + compile on a background thread while the first task
            # decodes (zlib/C++ decode releases the GIL)
            import threading

            def _inline_warm():
                try:
                    import jax
                    import jax.numpy as jnp
                    from sniffles_tpu.ops.clustering import call_task_packed
                    from sniffles_tpu.parallel.device_call import (DEVICE_BATCH_FLOOR,
                                                                   PACKED_ROWS)
                    from sniffles_tpu.parallel.device_service import standard_call_meta
                    jax.device_get(call_task_packed(
                        jnp.zeros((PACKED_ROWS, DEVICE_BATCH_FLOOR), jnp.int32),
                        **standard_call_meta(config)))
                except Exception:
                    log.debug("inline device warmup failed", exc_info=True)

            threading.Thread(target=_inline_warm, daemon=True).start()

    started = time.monotonic()
    for p in processes:
        p.start()

    if config.threads and device_server is not None:
        # all workers are forked; claim the chip + compile the standard
        # call-step shape on the dispatcher thread NOW, overlapping the
        # workers' first BAM decode (the claim costs ~1s steady-state
        # and the first task would otherwise stall on it)
        device_server.warm_async(config if getattr(config, "tpu_call", False)
                                 else None)

    while any([p.run_parent() for p in processes if p.running]):
        time.sleep(0.01)

    finished_tasks = []
    for p in processes:
        p.finalize()
        finished_tasks.extend(p.finished_tasks)
    log.info(f"Analysis took {time.monotonic() - started:.2f}s.")

    if len(tasks) > 0:
        log.warning("All workers have exited but work remains to be done; partial results "
                    "will be written.")
    # Deterministic emission in task-id order (reference: sniffles:544-547)
    finished_tasks.sort(key=lambda task: task.id)
    _report_engine_counters(finished_tasks)
    return finished_tasks


def _report_engine_counters(finished_tasks) -> None:
    """Aggregate the per-task device engine-stat consumption counters
    (parallel/device_call.device_clusters) across the run; logged, and
    written as JSON when SNIFFLES_TPU_COUNTERS_JSON names a path (the
    bench records them as a checked-in artifact)."""
    totals: dict = {}
    seen = False
    for t in finished_tasks:
        counters = getattr(t.result, "engine_counters", None)
        if counters is None:
            continue
        seen = True
        for k, v in counters.items():
            totals[k] = totals.get(k, 0) + v
    if not seen:
        return
    total = totals.get("children_total", 0)
    consumed = totals.get("engine_consumed", 0)
    log.info(f"Device engine stats consumed by {consumed}/{total} children "
             f"of {totals.get('clusters_total', 0)} clusters "
             f"(fallbacks: bnd={totals.get('fb_bnd', 0)}, "
             f"multi_fragment={totals.get('fb_multi_fragment', 0)}, "
             f"resplit={totals.get('fb_resplit', 0)}, "
             f"collision={totals.get('fb_support_collision', 0)})")
    path = os.environ.get("SNIFFLES_TPU_COUNTERS_JSON")
    if path:
        try:
            import json
            with open(path, "w") as f:
                json.dump(totals, f)
        except OSError:
            log.warning(f"could not write engine counters to {path}")


def _attach_remote_debugger(port: int) -> None:
    """--dev-debug PORT: attach to an IDE debug server on localhost
    (reference: sniffles:70-81 via pydevd_pycharm). Tries pydevd_pycharm,
    pydevd, then debugpy; logs and continues when none is importable."""
    try:
        try:
            import pydevd_pycharm
            pydevd_pycharm.settrace('localhost', port=port, stdoutToServer=True,
                                    stderrToServer=True)
            return
        except ImportError:
            pass
        try:
            import pydevd
            pydevd.settrace('localhost', port=port, stdout_to_server=True,
                            stderr_to_server=True)
            return
        except ImportError:
            pass
        import debugpy
        debugpy.connect(("localhost", port))
        log.info(f"Attached debugpy client to localhost:{port}")
    except Exception as e:
        log.warning(f"--dev-debug {port}: could not attach a remote debugger "
                    f"(pydevd_pycharm/pydevd/debugpy): {e}")


def _maybe_init_distributed(config) -> bool:
    """Join the multi-host runtime when the environment announces one
    (SNIFFLES_TPU_COORDINATOR / SNIFFLES_TPU_NUM_PROCESSES, or a TPU pod
    with autodetection). Each host then executes its own contig-shard
    subset and results are gathered to process 0 for emission
    (SURVEY §2.3 TPU mapping; design: parallel/distributed.py)."""
    if not (os.environ.get("SNIFFLES_TPU_COORDINATOR")
            or os.environ.get("SNIFFLES_TPU_NUM_PROCESSES")):
        return False
    from sniffles_tpu.parallel import distributed
    return distributed.initialize()


class _RemoteTask:
    """Shim around a result gathered from another process: just enough
    surface (id, result) for the ordered emission loop."""

    def __init__(self, task_id, result):
        self.id = task_id
        self.result = result


def _exchange_results_multihost(finished_tasks):
    """Allgather per-process results so process 0 can emit the complete,
    deterministically ordered output (the VCF-emission-by-allgather leg
    of the multi-host design). Results ride the collective backend as
    pickled uint8 tensors padded to the global maximum length."""
    import pickle

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    payload = pickle.dumps([(t.id, t.result) for t in finished_tasks],
                           protocol=pickle.HIGHEST_PROTOCOL)
    arr = np.frombuffer(payload, dtype=np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([arr.size], dtype=np.int64)).reshape(-1)
    padded = np.zeros(int(sizes.max()), dtype=np.uint8)
    padded[:arr.size] = arr
    rows = multihost_utils.process_allgather(padded)
    rows = np.asarray(rows).reshape(jax.process_count(), -1)

    merged = []
    for row, size in zip(rows, sizes):
        for task_id, result in pickle.loads(row[:int(size)].tobytes()):
            merged.append(_RemoteTask(task_id, result))
    merged.sort(key=lambda t: t.id)
    return merged


def _merge_candidate_csvs(config, finished_tasks):
    """Concatenate per-task candidate CSVs (reference: sniffles:549-558)."""
    from shutil import copyfileobj
    with open(config.dev_output_candidates, "w") as merged:
        merged.write('svtype,orientation_start,contig_start,pos_start,orientation_end,contig_end,'
                     'pos_end,filter,support_inline,support_split,support_ref\n')
        for t in finished_tasks:
            part = t.result.candidate_filename
            if part and os.path.exists(part):
                with open(part, "r") as f:
                    copyfileobj(f, merged)
                os.unlink(part)


def main_with_config(config: SnifflesConfig, processes: list) -> int:
    from sniffles_tpu.resmon import ResourceMonitor

    if getattr(config, "dev_debug", None):
        _attach_remote_debugger(config.dev_debug)
    if config.no_progress:
        logging.getLogger('sniffles_tpu.progress').setLevel(logging.CRITICAL)
    if config.dev_debug_log:
        logging.getLogger().setLevel(logging.DEBUG)

    if sys.platform in ("darwin", "linux"):
        try:
            multiprocessing.set_start_method("fork")
        except RuntimeError:
            pass

    exts = _detect_mode(config)
    log.info(f"Running {config.version}, build {config.build}")
    log.info(f"  Run Mode: {config.mode}")

    multihost = _maybe_init_distributed(config)
    emit_here = True
    if multihost:
        from sniffles_tpu.parallel import distributed
        emit_here = distributed.is_emitter()

    monitor = ResourceMonitor(config)
    rkwargs = {}
    bam_in = None
    vcf_in = None
    tandem_repeats = {}
    genotype_contig_svs = None

    if config.mode in ("call_sample", "genotype_vcf"):
        bam_in = _open_alignments(config)
        if config.tandem_repeats is not None:
            tandem_repeats = util.load_tandem_repeats(
                config.tandem_repeats, config.tandem_repeat_region_pad)

    if config.mode == "genotype_vcf":
        vcf_in, lineindex_order, genotype_contig_svs = _load_genotype_targets(config)
        rkwargs['genotype_lineindex_order'] = lineindex_order

    # only the emitter process touches output files
    vcf_out = _open_vcf_out(config) if (config.vcf is not None and emit_here) else None
    snf_out = _open_snf_out(config) if (config.snf is not None and emit_here) else None
    psnf_out = None
    if config.dev_population_snf and emit_here:
        psnf_out = _open_psnf_out(config)
        rkwargs['psnf_out'] = psnf_out

    contigs = []
    if config.mode == "combine":
        tasks, contig_lengths = _plan_combine_tasks(config, exts, start_task_id=0)
    else:
        tasks, contigs, contig_lengths = _plan_interval_tasks(
            config, bam_in, tandem_repeats, genotype_contig_svs)

    if config.mode == "genotype_vcf" and vcf_out is not None:
        vcf_out.rewrite_header_genotype(vcf_in.header_str)
    elif vcf_out is not None:
        vcf_out.write_header(contig_lengths)

    if multihost:
        # deterministic shard ownership: every process plans the same task
        # list and executes the slice assigned to it
        from sniffles_tpu.parallel import distributed
        own = set(distributed.shard_assignment(len(tasks)))
        tasks = deque(t for i, t in enumerate(tasks) if i in own)

    finished_tasks = _run_pool(config, tasks, processes, monitor)

    if multihost:
        finished_tasks = _exchange_results_multihost(finished_tasks)
        if not emit_here:
            if monitor:
                monitor.stop()
            return 0

    for t in finished_tasks:
        t.result.emit(vcf_out=vcf_out, snf_out=snf_out, **rkwargs)

    if config.dev_output_candidates and config.mode == "call_sample":
        _merge_candidate_csvs(config, finished_tasks)

    if snf_out:
        stored = snf_out.write_results(config, contigs)
        snf_out.close()
        log.info(f"Wrote {stored} SV candidates to {config.snf}")

    if psnf_out:
        stored = psnf_out.write_results(config, contigs)
        psnf_out.close()
        log.info(f'Wrote {stored} SVs to population SNF.')

    if config.vcf is not None:
        vcf_out.close()
        if config.vcf_output_bgz:
            from sniffles_tpu.io.tabix import tabix_compress_and_index
            try:
                tabix_compress_and_index(config.uncompressed_vcf_name, config.vcf)
            except Exception:
                log.exception('Error indexing VCF.')
        if config.mode in ("call_sample", "combine"):
            log.info(f"Wrote {vcf_out.call_count} called SVs to {config.vcf}")

    if monitor:
        monitor.stop()

    # The reference logs task errors and still exits 0 with partial
    # results (reference: result.py:288-299, sniffles:544-547); surface
    # them in the exit code instead so pipelines can't silently consume
    # a truncated VCF.
    n_errors = sum(1 for t in finished_tasks if getattr(t.result, "error", False))
    if n_errors or len(tasks) > 0:
        log.error(f"{n_errors} task(s) failed, {len(tasks)} task(s) unprocessed; "
                  f"output is partial.")
        return 1
    return 0


_LOG_FORMAT = '%(asctime)s %(levelname)s %(name)s (%(process)d): %(message)s'
_LOGGING_CONFIG = {
    'version': 1,
    'disable_existing_loggers': False,
    'formatters': {'default': {'format': _LOG_FORMAT}},
    'handlers': {'console': {'class': 'logging.StreamHandler',
                             'formatter': 'default',
                             'stream': 'ext://sys.stdout'}},
    'loggers': {'sniffles_tpu.progress': {'level': logging.WARNING}},
    'root': {'level': logging.INFO, 'handlers': ['console']},
}


def main(args: list[str] = None) -> int:
    processes: list = []

    if os.environ.get("SNIFFLES_TPU_FORCE_CPU"):
        # test/CI hook: pin the JAX platform before any backend init (the
        # axon sitecustomize overrides the JAX_PLATFORMS env var)
        try:
            import jax
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    logging.config.dictConfig(_LOGGING_CONFIG)

    try:
        config = SnifflesConfig(*(args or []))
        return main_with_config(config, processes) or 0
    except (util.SnifflesTPUExit, SystemExit) as exit_code:
        if len(processes):
            print("sniffles-tpu: Shutting down workers")
            time.sleep(1)
        for stage in ("terminate", "join"):
            for proc in processes:
                try:
                    getattr(proc.process, stage)()
                except Exception:
                    pass
        return getattr(exit_code, 'code', 1) or 0
    except Exception:
        logging.getLogger('sniffles_tpu.main').exception('Unhandled error while running.')
        return 1


if __name__ == "__main__":
    # hard exit (not sys.exit): background JAX warmup/dispatcher threads
    # may still be inside native XLA code, and interpreter finalization
    # under a compiling daemon thread segfaults; main() has already
    # flushed and closed every output
    code = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)
