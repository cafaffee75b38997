"""
Result transport objects sent worker -> parent (reference: result.py:23-299).
"""
from __future__ import annotations

import logging
import os

from sniffles_tpu.config import SnifflesConfig
from sniffles_tpu.svcall import SVCall

log = logging.getLogger(__name__)


class Result:
    """A generic result of a task executed by a worker process (reference: result.py:23-65)."""
    processed_read_count: int
    task_id: int
    run_id: str
    contig: str
    svcalls: list[SVCall]
    svcount: int
    error: bool = False

    def __init__(self, task, svcalls: list[SVCall], candidates_processed: int):
        self.task_id = task.id
        self.run_id = task.config.run_id
        self.contig = task.contig
        self.processed_read_count = candidates_processed
        self.svcount = len(svcalls)
        self.store_calls(svcalls)

    def store_calls(self, svcalls: list[SVCall]) -> None:
        self.svcalls = svcalls

    def emit(self, vcf_out=None, **kwargs) -> int:
        if vcf_out is not None:
            calls = self.svcalls
            if calls:
                for call in calls:
                    vcf_out.write_call(call)
            return len(calls)
        return 0


class CallResult(Result):
    """(reference: result.py:68-110)"""
    coverage_average_total: float
    has_snf = False
    snf_filename = None
    snf_index = None
    snf_total_length = None
    snf_candidate_count = None
    candidate_filename = None

    def store_candidates(self, candidates: list[SVCall]) -> None:
        if SnifflesConfig.GLOBAL.dev_output_candidates:
            self.candidate_filename = filename = os.path.join(
                SnifflesConfig.GLOBAL.tmp_dir,
                f'candidates.tmp-{self.run_id}-{self.task_id}.csv'
            )
            with open(filename, "w") as f:
                for cand in candidates:
                    if line := cand.csv_line:
                        try:
                            f.write(','.join(line))
                            f.write('\n')
                        except Exception:
                            log.exception(f'Error writing CSV line for {cand}')
                for cand in candidates:
                    if line := cand.csv_line_single:
                        try:
                            f.write(','.join(line))
                            f.write('\n')
                        except Exception:
                            log.exception(f'Error writing CSV line for single break for {cand}')

    def emit(self, **kwargs) -> int:
        res = super().emit(**kwargs)
        if snf_out := kwargs.get('snf_out'):
            snf_out.add_result(self)
        return res


class GenotypeResult(Result):
    """Result of a force-calling run (reference: result.py:113-130)."""

    def emit(self, vcf_out=None, snf_out=None, **kwargs) -> int:
        if vcf_out is not None:
            genotype_lineindex_order = kwargs['genotype_lineindex_order']
            returned = {}
            for svcall in self.svcalls:
                returned[svcall.raw_vcf_line_index] = svcall
            for lineindex in genotype_lineindex_order:
                if lineindex in returned:
                    vcf_out.rewrite_genotype(returned[lineindex])
        return len(self.svcalls)


class CombineResult(Result):
    """In-memory combine result (reference: result.py:133-161)."""

    def store_calls(self, svcalls: list[SVCall]) -> None:
        if SnifflesConfig.GLOBAL.sort:
            svcalls = sorted(svcalls, key=lambda call: call.pos)
        try:
            self.svcalls.extend(svcalls)
        except AttributeError:
            self.svcalls = list(svcalls)

    def finalize(self):
        if SnifflesConfig.GLOBAL.sort:
            self.svcalls.sort(key=lambda call: call.pos)

    def emit(self, vcf_out=None, **kwargs) -> int:
        res = super().emit(vcf_out=vcf_out, **kwargs)
        if (config := SnifflesConfig.GLOBAL).dev_population_snf:
            from sniffles_tpu.io.snfp import PopulationSNF
            PopulationSNF.create(config, self.svcalls)
        return res

    def __str__(self):
        return f'CombineResult #{self.task_id}'


class CombineResultTmpFile(CombineResult):
    """Combine result spilled to per-task part-VCFs (reference: result.py:164-242)."""
    _highest_position_call: int = -1
    unsorted: bool = False
    _initialized: bool = False

    @property
    def tmpfile_name(self) -> str:
        return os.path.join(SnifflesConfig.GLOBAL.tmp_dir,
                            f'result-{self.run_id}-{self.task_id:04}.part.vcf')

    @property
    def tmpfile_unsorted(self) -> str:
        return os.path.join(SnifflesConfig.GLOBAL.tmp_dir,
                            f'result-{self.run_id}-{self.task_id:04}-unsorted.part.vcf')

    def store_calls(self, svcalls):
        from sniffles_tpu.io.vcf import VCF
        offset = 0

        if not self._initialized:
            if os.path.exists(self.tmpfile_name):
                self.cleanup()
            self._initialized = True

        if SnifflesConfig.GLOBAL.sort and svcalls:
            svcalls = list(sorted(svcalls, key=lambda call: call.pos))

            while offset < len(svcalls) and svcalls[offset].pos < self._highest_position_call:
                log.debug(f'Unsorted call detected: {self._highest_position_call} > {svcalls[0]}')
                offset += 1

            if offset > 0:
                self.unsorted = True
                with open(self.tmpfile_unsorted, 'a') as f:
                    vcf = VCF(SnifflesConfig.GLOBAL, f)
                    for call in svcalls[:offset]:
                        vcf.write_call(call)

            self._highest_position_call = svcalls[-1].pos

        with open(self.tmpfile_name, 'a') as f:
            vcf = VCF(SnifflesConfig.GLOBAL, f)
            vcf.open_reference(generate_index=False)
            for call in svcalls[offset:]:
                vcf.write_call(call)

    def finalize(self):
        ...

    def emit(self, vcf_out=None, **kwargs) -> int:
        n = 0
        try:
            with open(self.tmpfile_name, 'r') as f:
                for line in f:
                    vcf_out.handle.write(line)
                    n += 1
        except FileNotFoundError:
            pass
        vcf_out.call_count += n
        self.cleanup()
        return n

    def cleanup(self):
        try:
            os.unlink(self.tmpfile_name)
        except FileNotFoundError:
            ...


class CombineResultTmpFilePopulationSNF(CombineResultTmpFile):
    """Combine result + population SNF creation (reference: result.py:245-285)."""

    @property
    def snf_filename(self) -> str:
        return os.path.join(SnifflesConfig.GLOBAL.tmp_dir,
                            f'result-{self.run_id}-{self.task_id:04}.part.snf')

    has_snf = True
    snf_index: dict
    snf_total_length: int
    snf_candidate_count: int = 0
    svcalls: list = None

    def store_calls(self, svcalls: list[SVCall]) -> None:
        super().store_calls(svcalls)
        if self.svcalls is None:
            self.svcalls = []
        self.svcalls.extend(svcalls)

    def finalize(self):
        from sniffles_tpu.io.snfp import PopulationSNF
        with open(self.snf_filename, 'wb') as handle:
            snfp = PopulationSNF(SnifflesConfig.GLOBAL, handle)
            c = 0
            for call in self.svcalls:
                c += 1 if snfp.store(call) else 0
            snfp.write_and_index()

        self.snf_index = snfp.get_index()
        self.snf_total_length = snfp.get_total_length()
        self.snf_candidate_count = c

    def emit(self, vcf_out=None, **kwargs) -> int:
        res = super().emit(vcf_out=vcf_out, **kwargs)
        if psnf_out := kwargs.get('psnf_out'):
            psnf_out.add_result(self)
        return res


class ErrorResult:
    error = True

    def __init__(self, msg: str):
        self.message = msg

    def __str__(self):
        return self.message

    def emit(self, **kwargs) -> int:
        log.error(f'{self.message}')
        return 0
