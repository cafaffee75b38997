"""
CLI driver: mode selection, input validation, task planning, worker
lifecycle and ordered result emission (reference: src/sniffles/sniffles
:64-650).
"""
from __future__ import annotations

import logging
import logging.config
import math
import multiprocessing
import os
import sys
import time
from collections import deque
from typing import Optional

from sniffles_tpu import util
from sniffles_tpu.config import SnifflesConfig


def main_with_config(config: SnifflesConfig, processes: list) -> int:
    from sniffles_tpu.io import vcf as vcfmod
    from sniffles_tpu.io import snf as snfmod
    from sniffles_tpu.io.bam import AlignmentFile
    from sniffles_tpu.pipeline import tasks as taskmod
    from sniffles_tpu.pipeline import runtime
    from sniffles_tpu.resmon import ResourceMonitor

    log = logging.getLogger('sniffles_tpu.main')

    if config.no_progress:
        logging.getLogger('sniffles_tpu.progress').setLevel(logging.CRITICAL)

    input_ext = [f.split(".")[-1].lower() for f in config.input]

    if sys.platform in ("darwin", "linux"):
        try:
            multiprocessing.set_start_method("fork")
        except RuntimeError:
            pass

    if len(set(input_ext)) > 1:
        util.fatal_error_main(
            "Please specify either: A single .bam/.cram file - OR - one or more .snf files - OR "
            "- a single .tsv file containing a list of .snf files and optional sample ids as "
            f"input. (supplied were: {list(set(input_ext))})")

    if "bam" in input_ext or "cram" in input_ext:
        if input_ext.count("bam") + input_ext.count("cram") > 1:
            util.fatal_error_main("Please specify max 1 .bam/.cram file as input")
        config.input = config.input[0]

        if config.genotype_vcf is not None:
            config.mode = "genotype_vcf"
        else:
            config.mode = "call_sample"

        config.input_is_cram = False
        if "bam" in input_ext:
            config.input_mode = r"rb"
        elif "cram" in input_ext:
            config.input_mode = r"rc"
            config.input_is_cram = True
    elif "snf" in input_ext or "tsv" in input_ext:
        config.mode = "combine"
    else:
        util.fatal_error_main(
            "Failed to determine run mode from input. Please specify either: A single .bam file "
            "- OR - one or more .snf files - OR - a single .tsv file as input.")

    if config.mode != "call_sample" and config.snf is not None:
        util.fatal_error_main(f"--snf cannot be used with run mode {config.mode}")

    if config.vcf is None and config.snf is None:
        util.fatal_error_main("Please specify at least one of: --vcf or --snf for output")

    if config.dev_debug_log:
        logging.getLogger().setLevel(logging.DEBUG)

    if config.mode == "call_sample":
        if config.sample_id is None:
            config.sample_ids_vcf = [(0, "SAMPLE")]
        else:
            config.sample_ids_vcf = [(0, config.sample_id)]
    elif config.mode == "combine":
        config.sample_id = None
        if config.combine_consensus:
            config.sample_ids_vcf = [(0, "CONSENSUS")]
        else:
            config.sample_ids_vcf = []

    log.info(f"Running {config.version}, build {config.build}")
    log.info(f"  Run Mode: {config.mode}")

    rkwargs = {}
    bam_in = None

    monitor = ResourceMonitor(config)

    contig_tandem_repeats = {}
    if config.mode in ("call_sample", "genotype_vcf"):
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

        if config.tandem_repeats is not None:
            contig_tandem_repeats = util.load_tandem_repeats(config.tandem_repeats,
                                                             config.tandem_repeat_region_pad)

    # genotype_vcf: read SVs from VCF to be genotyped
    if config.mode == "genotype_vcf":
        path, ext = os.path.splitext(config.genotype_vcf)
        ext = ext.lower()
        if ext == ".gz":
            import gzip
            vcf_in_handle = gzip.open(config.genotype_vcf, "rt")
        elif ext == ".vcf":
            vcf_in_handle = open(config.genotype_vcf, "r")
        else:
            util.fatal_error_main("Expected a .vcf or .vcf.gz file for --genotype-vcf")
        vcf_in = vcfmod.VCF(config, vcf_in_handle)

        genotype_lineindex_order = []
        genotype_lineindex_svs = {}
        genotype_contig_svs = {}
        for svc in vcf_in.read_svs_iter():
            genotype_contig_svs.setdefault(svc.contig, [])
            assert svc.raw_vcf_line_index not in genotype_lineindex_svs
            genotype_lineindex_order.append(svc.raw_vcf_line_index)
            genotype_lineindex_svs[svc.raw_vcf_line_index] = svc
            genotype_contig_svs[svc.contig].append(svc)
        rkwargs['genotype_lineindex_order'] = genotype_lineindex_order
        log.info(f"Read {len(genotype_lineindex_svs)} SVs to be genotyped")

    # Open outputs
    vcf_out = None
    if config.vcf is not None:
        if os.path.exists(config.vcf) and not config.allow_overwrite:
            util.fatal_error_main(f"Output file '{config.vcf}' already exists! Use "
                                  f"--allow-overwrite to ignore this check.")
        if config.vcf_output_bgz and not config.sort:
            util.fatal_error_main(".gz (bgzip) output is only supported with sorting enabled")

        parent_dir = os.path.dirname(os.path.abspath(config.uncompressed_vcf_name))
        if not os.path.exists(parent_dir):
            util.fatal_error_main(f"Directory {parent_dir} does not exist.")

        vcf_handle = open(config.uncompressed_vcf_name, "w")
        vcf_out = vcfmod.VCF(config, vcf_handle)

        if config.mode in ("call_sample", "combine"):
            vcf_out.open_reference()
        log.info(f"Opening for writing: {config.vcf}")

    snf_out = None
    if config.snf is not None:
        if os.path.exists(config.snf) and not config.allow_overwrite:
            util.fatal_error_main(f"Output file '{config.snf}' already exists! Use "
                                  f"--allow-overwrite to ignore this check.")
        snf_out = snfmod.SNFile(config, open(config.snf, "wb"))

    psnf_out = None
    if psnf_name := config.dev_population_snf:
        if os.path.exists(psnf_name) and not config.allow_overwrite:
            util.fatal_error_main(f'Population SNF {psnf_name} already exists!')
        from sniffles_tpu.io.snfp import PopulationSNF
        psnf_out = PopulationSNF(config, open(psnf_name, 'wb'))
        rkwargs['psnf_out'] = psnf_out

    # Plan tasks
    task_id = 0
    tasks = deque()
    contigs = []
    contig_lengths = []

    if config.mode in ("call_sample", "genotype_vcf"):
        task_classes = {
            'call_sample': taskmod.CallTask,
            'genotype_vcf': taskmod.GenotypeTask,
        }

        total_mapped = bam_in.mapped
        if (config.threads == 1 and not config.low_memory) or config.task_count_multiplier == 0:
            task_max_reads = total_mapped
        else:
            task_max_reads = max(1, math.floor(total_mapped / (config.threads * config.task_count_multiplier)))

        if total_mapped == 0:
            config.task_read_id_offset_mult = 10 ** 9
        else:
            config.task_read_id_offset_mult = 10 ** math.ceil(math.log(total_mapped) + 1)

        contigs_with_tr_annotations = 0
        for contig in bam_in.get_index_statistics():
            if task_max_reads == 0:
                task_count = 1
            else:
                task_count = max(1, math.ceil(contig.mapped / float(task_max_reads)))
            contig_str = str(contig.contig)

            contig_length = bam_in.get_reference_length(contig_str)
            if not util.should_process_contig(contig_str, contig_length, config):
                continue

            contigs.append(contig_str)
            contig_lengths.append((contig_str, contig_length))
            task_length = math.floor(contig_length / float(task_count))
            contigs_with_tr_annotations += int(contig_str in contig_tandem_repeats)
            startpos = 0

            while startpos < contig_length - 1:
                endpos = min(contig_length - 1, startpos + task_length)
                if config.genotype_vcf is not None:
                    if contig_str in genotype_contig_svs:
                        genotype_svs = [target_sv for target_sv in genotype_contig_svs[contig_str]
                                        if startpos <= target_sv.pos < endpos]
                    else:
                        genotype_svs = []
                else:
                    genotype_svs = None

                task = task_classes[config.mode](
                    id=task_id,
                    contig=contig_str,
                    start=startpos,
                    end=endpos,
                    assigned_process_id=None,
                    tandem_repeats=contig_tandem_repeats.get(contig_str),
                    genotype_svs=genotype_svs,
                    sv_id=0,
                    config=config,
                    regions=config.regions_by_contig.get(contig_str),
                )
                tasks.append(task)
                startpos += task_length
                task_id += 1
        config.contig_lengths = contig_lengths

        if contigs_with_tr_annotations < len(contig_lengths) and config.tandem_repeats is not None:
            if contigs_with_tr_annotations == 0:
                util.fatal_error_main(
                    "A tandem repeat annotations file was provided, but no matching annotations "
                    "were found for any contig in the sample input file.")

    elif config.mode == "combine":
        config.snf_input_info = []
        total_mapped = 0

        input_snfs_sample_ids: list[tuple[str, Optional[str]]] = []

        if len(config.input) == 1 and input_ext[0] == "tsv":
            with open(config.input[0], "r") as tsv_handle:
                for line_index, line in enumerate(tsv_handle.readlines()):
                    line_strip = line.strip()
                    if len(line_strip) == 0 or line_strip[0] == "#":
                        continue
                    parts = line_strip.split("\t")
                    if len(parts) == 1:
                        input_snfs_sample_ids.append((parts[0], None))
                    elif len(parts) == 2:
                        input_snfs_sample_ids.append((parts[0], parts[1]))
                    else:
                        util.fatal_error_main(
                            f"Invalid sample list .tsv: {config.input[0]}: Line {line_index + 1}")
        elif input_ext[0] == "snf":
            input_snfs_sample_ids = [(item, None) for item in config.input]
        else:
            util.fatal_error_main("Failed to determine .snf files to be combined.")

        for snf_internal_id, (input_filename, sample_id) in enumerate(input_snfs_sample_ids):
            snf_in = snfmod.SNFile(config, open(input_filename, "rb"), filename=input_filename)
            snf_in.read_header()
            total_mapped += snf_in.header["snf_candidate_count"]
            contig_lengths = snf_in.header["config"]["contig_lengths"]
            if not config.dev_skip_snf_validation:
                if config.snf_block_size != snf_in.header["config"]["snf_block_size"]:
                    util.fatal_error_main(f"SNF block size differs for {input_filename}")
                if config.snf_format_version != snf_in.header["config"]["snf_format_version"]:
                    util.fatal_error_main(f"SNF format version for {input_filename} is not supported")
            if sample_id is None:
                if snf_in.header["config"]["sample_id"] is not None:
                    sample_id = snf_in.header["config"]["sample_id"]
                else:
                    sample_id, _ = os.path.splitext(os.path.basename(input_filename))
            config.snf_input_info.append({"internal_id": snf_internal_id, "sample_id": sample_id,
                                          "filename": input_filename})
            snf_in.close()
            log.info(f"    {input_filename} (sample ID in output VCF='{sample_id}')")

        if not config.combine_consensus:
            for info in config.snf_input_info:
                config.sample_ids_vcf.append((info["internal_id"], info["sample_id"]))

        if to_process := (config.contig or config.regions_by_contig):
            contig_lengths = [(name, length) for name, length in contig_lengths if name in to_process]

        result_class = None
        if len(input_snfs_sample_ids) > config.combine_max_inmemory_results:
            from sniffles_tpu.pipeline.result import CombineResultTmpFile
            result_class = CombineResultTmpFile
            if config.sort and config.vcf_output_bgz:
                config.vcf = config.uncompressed_vcf_name
                config.no_sort = True

        if config.dev_population_snf:
            from sniffles_tpu.pipeline.result import CombineResultTmpFilePopulationSNF
            result_class = CombineResultTmpFilePopulationSNF

        for contig_str, contig_length in contig_lengths:
            task = taskmod.CombineTask(
                id=task_id,
                contig=contig_str,
                start=0,
                end=contig_length - 1,
                assigned_process_id=None,
                sv_id=0,
                config=config,
                result_class=result_class,
                regions=config.regions_by_contig.get(contig_str)
            )
            tasks.extend(task.scatter())
            task_id = tasks[-1].id + 1

    if config.mode != "genotype_vcf" and config.vcf is not None:
        vcf_out.write_header(contig_lengths)
    elif config.mode == "genotype_vcf":
        vcf_out.rewrite_header_genotype(vcf_in.header_str)

    # Start workers
    if config.threads:
        for pnum in range(config.threads):
            processes.append(runtime.SnifflesWorker(process_id=pnum, config=config, tasks=tasks,
                                                    recycle_hint=monitor, peers=processes))
    else:
        processes.append(runtime.SnifflesParentWorker(config=config, tasks=tasks))

    analysis_start_time = time.monotonic()

    for p in processes:
        p.start()

    finished_tasks = []

    while any([p.run_parent() for p in processes if p.running]):
        time.sleep(0.01)

    for p in processes:
        p.finalize()
        finished_tasks.extend(p.finished_tasks)

    log.info(f"Analysis took {time.monotonic() - analysis_start_time:.2f}s.")

    if len(tasks) > 0:
        log.warning("All workers have exited but work remains to be done; partial results "
                    "will be written.")

    # Deterministic emission in task-id order (reference: sniffles:544-547)
    finished_tasks.sort(key=lambda task: task.id)

    for t in finished_tasks:
        t.result.emit(vcf_out=vcf_out, snf_out=snf_out, **rkwargs)

    if config.dev_output_candidates and config.mode == "call_sample":
        from shutil import copyfileobj
        with open(config.dev_output_candidates, "w") as csv:
            csv.write('svtype,orientation_start,contig_start,pos_start,orientation_end,contig_end,'
                      'pos_end,filter,support_inline,support_split,support_ref\n')
            for t in finished_tasks:
                tmpfile = t.result.candidate_filename
                if tmpfile and os.path.exists(tmpfile):
                    with open(tmpfile, "r") as f:
                        copyfileobj(f, csv)
                    os.unlink(tmpfile)

    if snf_out:
        snf_candidate_count = snf_out.write_results(config, contigs)
        snf_out.close()
        log.info(f"Wrote {snf_candidate_count} SV candidates to {config.snf}")

    if psnf_out:
        c = psnf_out.write_results(config, contigs)
        psnf_out.close()
        log.info(f'Wrote {c} SVs to population SNF.')

    if config.vcf is not None:
        vcf_out.close()
        if config.vcf_output_bgz:
            from sniffles_tpu.io.tabix import tabix_compress_and_index
            try:
                tabix_compress_and_index(config.uncompressed_vcf_name, config.vcf)
            except Exception:
                log.exception('Error indexing VCF.')

    if config.mode in ("call_sample", "combine") and config.vcf is not None:
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

    logging.config.dictConfig({
        'version': 1,
        'formatters': {
            'default': {'format': '%(asctime)s %(levelname)s %(name)s (%(process)d): %(message)s'}
        },
        'handlers': {
            'console': {
                'class': 'logging.StreamHandler',
                'formatter': 'default',
                'stream': 'ext://sys.stdout',
            }
        },
        'loggers': {
            'sniffles_tpu.progress': {'level': logging.WARNING},
        },
        'root': {'level': logging.INFO, 'handlers': ['console']},
        'disable_existing_loggers': False,
    })

    try:
        config = SnifflesConfig(*(args or []))
        return main_with_config(config, processes) or 0
    except (util.SnifflesTPUExit, SystemExit) as exit_code:
        if len(processes):
            print("sniffles-tpu: Shutting down workers")
            time.sleep(1)
        for proc in processes:
            try:
                proc.process.terminate()
            except Exception:
                pass
        for proc in processes:
            try:
                proc.process.join()
            except Exception:
                pass
        return getattr(exit_code, 'code', 1) or 0
    except Exception:
        logging.getLogger('sniffles_tpu.main').exception('Unhandled error while running.')
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
