"""
Local assembly rescue for filtered INS/DEL calls.

Re-fetches supporting reads around a filtered call, builds a consensus
(ops/poa.py replaces SPOA), aligns consensus vs reference, locates the
gap and rescues the call (reference: local_asm.py:26-304; gated at
parallel.py:186-196).
"""
from __future__ import annotations

import logging
from pathlib import Path

from sniffles_tpu.svcall import SVCall
from sniffles_tpu.ops.poa import poa

GAP = "-"
log = logging.getLogger('sniffles_tpu.local_asm')


class SPOA:
    """Size-tiered scoring matrices (reference: local_asm.py:26-73)."""

    def __init__(self):
        self.algorithm = {"local": 0, "global": 1, "semig": 2}
        self.sv_small = 400
        self.sv_middl = 1200
        self.sv_large = 10000
        # scores SV small x <= 400
        self.sv_s = (10, -10, -20, 0, -10, -1)
        # scores SV mid 400 < x <= 1200
        self.sv_m = (13, -5, -25, 0, -25, -1)
        # scores SV large 1200 < x
        self.sv_l = (10, -10, -30, -1, -15, -1)
        self.match = self.miss = self.gap_open = self.gap_expand = 0
        self.gap_open2 = self.gap_expand2 = 0

    def set(self, svlen: int):
        if abs(svlen) <= self.sv_small:
            t = self.sv_s
        elif self.sv_small < abs(svlen) <= self.sv_middl:
            t = self.sv_m
        else:
            t = self.sv_l
        (self.match, self.miss, self.gap_open, self.gap_expand,
         self.gap_open2, self.gap_expand2) = t


class LocalAsm:
    """(reference: local_asm.py:76-304)"""

    def __init__(self, sv: SVCall):
        self.sv = sv
        self.info_sv = ""

    def update_sv_cand(self, sv_pos: int, sv_seq: str):
        if "MOSAIC_VAF" == self.sv.filter:
            self.sv.set_info("MOSAIC", True)
            self.sv.filter = "GT"
        else:
            self.sv.filter = "PASS"
        self.sv.qc = True
        self.sv.pos = sv_pos
        self.sv.set_info("LASM", True)
        if "DEL" == self.sv.svtype:
            self.sv.end = sv_pos + len(sv_seq) + 1
        elif "INS" == self.sv.svtype:
            self.sv.end = sv_pos + 1

    @staticmethod
    def open_bam(bam_file_in: str, ref: str):
        from sniffles_tpu.io.bam import AlignmentFile
        mode = r"rc" if "cram" in bam_file_in else r"rb"
        return AlignmentFile(bam_file_in, mode=mode, require_index=True, reference_filename=ref)

    @staticmethod
    def ref_seq_by_region(fas, region: str):
        return fas.fetch(region=region)

    @staticmethod
    def region_pos(region: str):
        [_, posit] = region.split(":")
        [start, end] = posit.split("-")
        return int(start), int(end)

    def select_padding(self, read_type: str, default_pad: int = 2000):
        svlen_pad = self.sv.svlen if "sv" == read_type else round(self.sv.svlen / 2)
        max_padding = default_pad * 3
        if abs(self.sv.svlen) <= 400:
            return min(max(round(svlen_pad * 0.5), round(default_pad * 0.70)), max_padding)
        elif 400 < abs(self.sv.svlen) <= 1200:
            return min(max(round(svlen_pad * 0.5), round(default_pad * 1.0)), max_padding)
        else:
            return min(max(round(svlen_pad * 0.75), round(default_pad * 1.2)), max_padding)

    def read_seq_by_name_del(self, bam, region: str, rnames: list[str]):
        """(reference: local_asm.py:126-152)"""
        contig = ""
        start, stop = [], []
        read_seqs = []
        extra_pad = 100
        for read in bam.fetch(region=region):
            if "" == contig:
                contig = read.reference_name
            if read.query_name in rnames:
                if read.query_sequence is not None:
                    padding = self.select_padding("sv")
                    pos = self.sv.pos - read.reference_start - padding
                    end = self.sv.end - read.reference_start + padding + 1
                    read_seq_del = read.query_sequence[pos:end]
                    read_len = len(read.query_sequence)
                    if len(read_seq_del) >= 2 * padding and (pos > 0 and 0 < end < read_len):
                        read_seqs.append(read_seq_del)
                        start.append(self.sv.pos - padding - extra_pad)
                        stop.append(self.sv.end + padding + extra_pad)

        region = f'{contig}:{min(start)}-{max(stop)}' if len(read_seqs) > 0 else ""
        return read_seqs, [], region

    def solve_del(self, region: str, sv_aln: str, ref_aln: str, eps: float = 0.15,
                  max_gaps_aln: int = 3):
        """(reference: local_asm.py:154-189)"""
        svlen = abs(self.sv.svlen)
        [ref_pos, _] = self.region_pos(region)
        gap_size = 0
        del_pos = 0
        n_gaps = 0
        count_gap = True
        ref_pos_calc = 0
        for char in sv_aln:
            if GAP == char:
                gap_size += 1
                if count_gap:
                    n_gaps += 1
                    count_gap = False
            else:
                count_gap = True
                if abs(gap_size - svlen) / float(svlen) <= eps and gap_size > 0:
                    del_pos = ref_pos + ref_pos_calc
                    break
                ref_pos_calc += 1
                gap_size = 0
        count_pos = 0
        ref_seq = ""
        for _ in ref_aln:
            count_pos += 1
            if count_pos == ref_pos_calc:
                ref_seq = ref_aln[count_pos:(count_pos + gap_size)]
                break
        return [del_pos, ref_seq, len(ref_seq) > 0 and
                (abs((gap_size - svlen) / float(svlen)) <= eps and gap_size > 0
                 and n_gaps <= max_gaps_aln)]

    def read_seq_by_name_ins(self, bam, region: str, rnames: list[str]):
        """(reference: local_asm.py:191-215)"""
        contig = ""
        start, stop = [], []
        read_seqs_sv = []
        for read in bam.fetch(region=region):
            if "" == contig:
                contig = read.reference_name
            if read.query_name in rnames:
                if read.query_sequence is not None:
                    padding = self.select_padding("sv")
                    pos = max(self.sv.pos - read.reference_start - padding, 0)
                    end = self.sv.pos - read.reference_start + self.sv.svlen + padding
                    read_seq_ins = read.query_sequence[pos:end]
                    read_len = len(read.query_sequence)
                    if len(read_seq_ins) >= self.sv.svlen + (2 * padding) and (pos > 0 and 0 < end < read_len):
                        read_seqs_sv.append(read_seq_ins)
                        start.append(self.sv.pos - padding)
                        stop.append(self.sv.pos + self.sv.svlen + padding)

        region = f'{contig}:{min(start)}-{max(stop)}' if len(read_seqs_sv) > 0 else ""
        return read_seqs_sv, [], region

    def solve_ins(self, region: str, sv_aln: str, ref_aln: str, eps: float = 0.15,
                  max_gaps_aln: int = 3):
        """(reference: local_asm.py:217-252)"""
        [ref_pos, _] = self.region_pos(region)
        gap_size = 0
        ins_pos = 0
        n_gaps = 0
        count_gap = True
        ref_pos_calc = 0
        for char in ref_aln:
            if GAP == char:
                gap_size += 1
                if count_gap:
                    n_gaps += 1
                    count_gap = False
            else:
                count_gap = True
                if abs((gap_size - self.sv.svlen) / self.sv.svlen) <= eps and gap_size > 0 and ref_pos > 0:
                    ins_pos = ref_pos + ref_pos_calc
                    break
                ref_pos_calc += 1
                gap_size = 0
        count_pos = 0
        ins_seq = ""
        for _ in sv_aln:
            count_pos += 1
            if count_pos == ref_pos_calc:
                ins_seq = sv_aln[count_pos:(count_pos + gap_size)]
                break
        return [ins_pos, ins_seq, len(ins_seq) > 0 and
                (abs((gap_size - self.sv.svlen) / self.sv.svlen) <= eps and gap_size > 0
                 and n_gaps <= max_gaps_aln)]

    def assembly(self, config, min_reads: int = 5, max_reads: int = 30,
                 fetch_read: int = 5000) -> bool:
        """(reference: local_asm.py:254-304)"""
        file_path = Path(config.input)
        if file_path.suffix not in [".bam", ".cram"]:
            log.warning(f'Input {config.input} is not BAM or CRAM, skipping local assembly')
            return False
        if config.reference is None:
            log.warning('Reference not provided, skipping local assembly')
            return False
        from sniffles_tpu.io.fasta import FastaFile
        bam = self.open_bam(config.input, config.reference)
        fas = FastaFile(config.reference)
        spoa = SPOA()
        region_sv_fetch = f'{self.sv.contig}:{self.sv.pos - fetch_read}-{self.sv.end + fetch_read}'
        svlen = abs(self.sv.svlen)
        sv_pos = 0
        sv_seq = ""
        spoa.set(svlen)
        if "DEL" == self.sv.svtype:
            read_seq, _, region_fas = self.read_seq_by_name_del(bam, region_sv_fetch, self.sv.rnames)
        elif "INS" == self.sv.svtype:
            read_seq, _, region_fas = self.read_seq_by_name_ins(bam, region_sv_fetch, self.sv.rnames)
        else:
            log.warning(f'SVTYPE: {self.sv.svtype} not supported, skipping local assembly')
            return False

        report_sv = False
        if len(read_seq) >= min_reads:
            ref_seq = self.ref_seq_by_region(fas, region_fas)
            min_cov = round(len(read_seq) * 0.50)
            read_seq = read_seq[:max_reads] if len(read_seq) > max_reads else read_seq
            consensus, _ = poa(sequences=read_seq, algorithm=spoa.algorithm["local"],
                               genmsa=True, min_coverage=min_cov)
            _, msa = poa(sequences=[consensus, ref_seq], algorithm=spoa.algorithm["local"],
                         genmsa=True, min_coverage=1,
                         m=spoa.match, n=spoa.miss, g=spoa.gap_open, e=spoa.gap_expand,
                         q=spoa.gap_open2, c=spoa.gap_expand2)
            if len(msa) == 2:
                [sv_aln, ref_aln] = msa
            else:
                return report_sv
            if "INS" == self.sv.svtype:
                [sv_pos, sv_seq, report_sv] = self.solve_ins(region_fas, sv_aln, ref_aln)
            elif "DEL" == self.sv.svtype:
                [sv_pos, sv_seq, report_sv] = self.solve_del(region_fas, sv_aln, ref_aln)
        if report_sv:
            self.update_sv_cand(sv_pos, sv_seq)
        return report_sv
