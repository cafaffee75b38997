"""
Signature clustering.

Host-side exact implementation of the reference's adaptive cluster
sweep, inner merge, svlen resplit and BND resplit (reference:
cluster.py:27-390). The merge sweep is an order-dependent sequential
algorithm with backtracking (i = max(0, i-2)); the device pipeline in
ops/clustering.py implements the sort-and-segment formulation and is
validated against this module.
"""
from __future__ import annotations

import logging
import math
import statistics
from collections import defaultdict
from dataclasses import dataclass
from typing import Optional, Any, Generator, Iterator, TYPE_CHECKING

from sniffles_tpu import svcall as sv
from sniffles_tpu import util

if TYPE_CHECKING:
    from sniffles_tpu import leads as leadprov

log = logging.getLogger(__name__)


@dataclass
class Cluster:
    """(reference: cluster.py:27-82)"""
    id: str
    svtype: str
    contig: str
    start: int
    end: int
    seed: int
    leads: list['leadprov.Lead']
    repeat: bool
    leads_long: Optional[list]
    hap_counts: tuple
    sa_counts: tuple = (0, 0.0)

    @property
    def span(self) -> Optional[int]:
        if self.end is None or self.start is None:
            return None
        return self.end - self.start

    def compute_metrics(self, max_n=100):
        n = min(len(self.leads), max_n)
        if n == 0:
            self.mean_svlen = 0
            self.stdev_start = 0
            return

        step = int(len(self.leads) / n)
        if n > 1:
            self.mean_svlen = sum(self.leads[i].svlen for i in range(0, len(self.leads), step)) / float(n)
            self.stdev_start = util.stdev([self.leads[i].ref_start for i in range(0, len(self.leads), step)])
        else:
            self.mean_svlen = self.leads[0].svlen
            self.stdev_start = 0

    def get_break(self):
        """Single-end break location for long-INS clusters (reference: cluster.py:63-77)."""
        from sniffles_tpu.config import SnifflesConfig

        if self.leads_long and len(self.leads_long) >= SnifflesConfig.GLOBAL.dev_single_break_count:
            loc = int(statistics.median(lead.ref_start for lead in self.leads_long))
            mean_start = int(statistics.mean(lead.ref_start for lead in self.leads_long))
            if abs(loc - mean_start) < SnifflesConfig.GLOBAL.dev_single_break_dist:
                return loc
            return None
        return None

    def get_sa_count(self):
        all_leads = self.leads + self.leads_long if self.leads_long is not None else self.leads
        sa_count = sum(1 for lead in all_leads if lead.is_sa)
        self.sa_counts = (sa_count, sa_count / float(len(all_leads)))


def merge_inner(cluster: Cluster, threshold: int) -> Cluster:
    """Merge fragmented INS/DEL leads of the same read (reference: cluster.py:85-122)."""
    read_seq: dict[str, list] = {}
    for ld in cluster.leads:
        read_seq.setdefault(ld.read_qname, []).append(ld)

    cluster.leads = []
    for qname in read_seq:
        read_seq[qname].sort(key=lambda k: k.ref_start)
        to_merge = read_seq[qname][0]

        curr_lead = to_merge

        last_ref_end = to_merge.ref_end
        last_qry_end = to_merge.qry_end
        last_ref_start = to_merge.ref_start
        last_qry_start = to_merge.qry_start

        for to_merge in read_seq[qname][1:]:
            merge = (threshold == -1) or (
                (abs(to_merge.ref_start - last_ref_end) < threshold
                 or abs(to_merge.ref_start - last_ref_start) < threshold)
                and (abs(to_merge.qry_start - last_qry_end) < threshold
                     or abs(to_merge.qry_start - last_qry_start) < threshold)
            ) and (curr_lead.strand == to_merge.strand)
            if merge:
                curr_lead.svlen += to_merge.svlen
                if to_merge.seq is None or curr_lead.seq is None:
                    curr_lead.seq = None
                else:
                    curr_lead.seq += to_merge.seq
            else:
                cluster.leads.append(curr_lead)
                curr_lead = to_merge
            last_ref_end = to_merge.ref_end
            last_qry_end = to_merge.qry_end
            last_ref_start = to_merge.ref_start
            last_qry_start = to_merge.qry_start

        cluster.leads.append(curr_lead)
    return cluster


def resplit(cluster: Cluster, prop, binsize, merge_threshold_min, merge_threshold_frac):
    """Re-split a cluster by the svlen histogram (reference: cluster.py:125-161)."""
    bins_leads: dict[int, list] = {}
    for lead in cluster.leads:
        bin = int(abs(prop(lead)) / binsize) * binsize
        bins_leads.setdefault(bin, []).append(lead)

    new_clusters = list(sorted(bins_leads.keys()))
    i = 1
    while len(new_clusters) > 1 and i < len(new_clusters):
        last_cluster = new_clusters[i - 1]
        curr_cluster = new_clusters[i]
        merge_threshold = max(merge_threshold_min, min(curr_cluster, last_cluster) * merge_threshold_frac)
        merge = abs(curr_cluster - last_cluster) <= merge_threshold
        if merge:
            bins_leads[new_clusters[i]].extend(bins_leads[new_clusters[i - 1]])
            new_clusters.pop(i - 1)
            i = max(0, i - 2)
        else:
            i += 1

    for cluster_index in new_clusters:
        yield Cluster(id=cluster.id + f".{cluster_index}",
                      svtype=cluster.svtype,
                      contig=cluster.contig,
                      start=cluster.start,
                      end=cluster.end,
                      seed=cluster.seed,
                      leads=bins_leads[cluster_index],
                      repeat=cluster.repeat,
                      leads_long=cluster.leads_long,
                      hap_counts=cluster.hap_counts)


def resplit_bnd(cluster: 'Cluster', merge_threshold: int) -> Iterator['Cluster']:
    """Group BND leads by (mate contig, orientation, mate pos bin)
    (reference: cluster.py:164-216)."""
    if len(cluster.leads) <= 1:
        yield cluster
        return

    contigs_leads: dict = defaultdict(lambda: defaultdict(list))

    for lead in cluster.leads:
        ld_ident = (lead.bnd_info.mate_contig, lead.bnd_info.is_first)
        pos_bin = (int(lead.bnd_info.mate_ref_start / merge_threshold) * merge_threshold
                   if merge_threshold > 0 else 0)
        contigs_leads[ld_ident][pos_bin].append(lead)

    for ld_ident in contigs_leads:
        contig, _ = ld_ident
        bins = sorted(contigs_leads[ld_ident])
        curr_leads = [] + contigs_leads[ld_ident][bins[0]]
        last_bin = bins[0]
        position_bin = 0
        for position_bin in bins[1:]:
            if position_bin - last_bin <= merge_threshold:
                curr_leads.extend(contigs_leads[ld_ident][position_bin])
            else:
                if len(curr_leads):
                    yield Cluster(id=cluster.id + f".CHR2.{contig}.POS2.{position_bin}",
                                  svtype=cluster.svtype,
                                  contig=cluster.contig,
                                  start=cluster.start,
                                  end=cluster.end,
                                  seed=cluster.seed,
                                  leads=[k for k in curr_leads],
                                  repeat=cluster.repeat,
                                  leads_long=None,
                                  hap_counts=cluster.hap_counts)
                curr_leads = [] + contigs_leads[ld_ident][position_bin]
            last_bin = position_bin
        if len(curr_leads):
            yield Cluster(id=cluster.id + f".CHR2.{contig}.POS2.{position_bin}",
                          svtype=cluster.svtype,
                          contig=cluster.contig,
                          start=cluster.start,
                          end=cluster.end,
                          seed=cluster.seed,
                          leads=[k for k in curr_leads],
                          repeat=cluster.repeat,
                          leads_long=None,
                          hap_counts=cluster.hap_counts)


def resolve(svtype, leadtab_provider, config, tr) -> Generator[Cluster | Any, None, list[Any] | None]:
    """Seed clusters per bin, adaptive merge sweep, then per-type refinement
    (reference: cluster.py:219-353)."""
    leadtab = leadtab_provider.leadtab[svtype]
    seeds = sorted(leadtab_provider.leadtab[svtype])
    hap_counts = leadtab_provider.leadhapcount[svtype]
    hap_ref = leadtab_provider.leadhapcount["REF"]

    if len(seeds) == 0:
        return []

    tr_index = 0
    if tr is not None:
        if len(tr) == 0:
            tr = None
        else:
            tr_start, tr_end = tr[tr_index]

    clusters = []
    for seed_index, seed in enumerate(seeds):

        within_tr = False
        if tr is not None and tr_index < len(tr):
            while tr_end < seed and tr_index + 1 < len(tr):
                tr_index += 1
                tr_start, tr_end = tr[tr_index]
            if tr_start < seed < tr_end:
                within_tr = True

        if svtype == "INS":
            leads = [lead for lead in leadtab[seed] if lead.svlen is not None]
            leads_long = [lead for lead in leadtab[seed] if lead.svlen is None]
        else:
            leads = leadtab[seed]
            leads_long = None

        sv0, sv1, sv2 = hap_counts[seed]
        if seed in hap_ref:
            hp0, hp1, hp2 = hap_ref[seed]
            hapl_count_full = (sv0, sv1, sv2, hp0, hp1, hp2)
        else:
            hapl_count_full = (sv0, sv1, sv2, 0, 0, 0)

        if len(leads) >= config.dev_min_leads_cluster:
            cluster = Cluster(
                id=f"CL.{svtype}.{leadtab_provider.contig}.{leadtab_provider.start}.{seed_index}",
                svtype=svtype,
                contig=leadtab_provider.contig,
                start=seed,
                end=seed + config.cluster_binsize,
                seed=seed,
                leads=leads,
                repeat=within_tr or config.repeat,
                leads_long=leads_long,
                hap_counts=hapl_count_full)

            cluster.compute_metrics()
            clusters.append(cluster)

    # Adaptive merge sweep with backtracking (reference: cluster.py:277-308)
    i = 0
    while i < len(clusters) - 1:
        curr_cluster = clusters[i]
        next_cluster = clusters[i + 1]

        inner_dist = (next_cluster.start - curr_cluster.end)
        outer_dist = (next_cluster.end - curr_cluster.start)
        merge = inner_dist <= min(curr_cluster.stdev_start, next_cluster.stdev_start) * config.cluster_r
        merge = merge or ((config.repeat or curr_cluster.repeat or next_cluster.repeat)
                          and outer_dist <= min(config.cluster_repeat_h_max,
                                                (abs(curr_cluster.mean_svlen)
                                                 + abs(next_cluster.mean_svlen)) * config.cluster_repeat_h))
        merge = merge or (svtype == "BND" and inner_dist <= config.cluster_merge_bnd)

        if merge:
            clusters.pop(i + 1)
            curr_cluster.leads += next_cluster.leads
            if svtype == "INS":
                curr_cluster.leads_long += next_cluster.leads_long
            curr_cluster.end = next_cluster.end
            curr_cluster.repeat = curr_cluster.repeat or next_cluster.repeat
            curr_cluster.compute_metrics()
            i = max(0, i - 2)
        i += 1

    if config.dev_trace_read:
        for c in clusters:
            for ld in c.leads:
                if ld.read_qname in config.dev_trace_read:
                    print(f"[DEV_TRACE_READ] [2/4] [cluster.resolve] Read lead {ld} is in "
                          f"cluster {c.id}, containing a total of {len(c.leads)} leads.")

    if config.dev_dump_clusters:
        filename = (f"{config.vcf}.clusters.{svtype}.{leadtab_provider.contig}."
                    f"{leadtab_provider.start}.{leadtab_provider.end}.bed")
        with open(filename, "w") as h:
            for c in clusters:
                info = f"ID={c.id}, #LEADS={len(c.leads)}; "
                for ld in c.leads:
                    info += f"(ref_start={ld.ref_start},svlen={ld.svlen},source={ld.source}); "
                h.write(f"{c.contig}\t{c.start}\t{c.end}\t\"{info}\"\n")

    for cluster in clusters:
        if len(cluster.leads) == 0:
            continue

        if svtype == "BND":
            if config.dev_no_resplit:
                yield cluster
            else:
                yield from resplit_bnd(cluster, merge_threshold=config.cluster_merge_bnd)
        else:
            if svtype == "INS" or svtype == "DEL":
                if cluster.repeat:
                    merge_inner_threshold = -1
                else:
                    merge_inner_threshold = config.cluster_merge_pos
                merge_inner(cluster, merge_inner_threshold)

            if not config.dev_no_resplit_repeat and not config.dev_no_resplit:
                yield from resplit(cluster,
                                   prop=lambda lead: lead.svlen,
                                   binsize=config.cluster_resplit_binsize,
                                   merge_threshold_min=config.minsvlen,
                                   merge_threshold_frac=config.cluster_merge_len)
            else:
                yield cluster


def resolve_block_groups(svtype, svcands, groups_initial, config, ed_cache=None):
    """Greedy best-group assignment for multi-sample combine
    (reference: cluster.py:356-390). ed_cache optionally carries
    device-precomputed pairwise edit distances for the INS identity gate."""
    groups = groups_initial
    for svcand in sorted(svcands, key=lambda cand: cand.support, reverse=True):
        best_group = None
        best_dist = math.inf

        if svtype == "BND":
            mate_contig, mate_ref_start = svcand.bnd_info.mate_contig, svcand.bnd_info.mate_ref_start
            for group in groups:
                dist = abs(group.pos_mean - svcand.pos) + abs(group.bnd_mate_ref_start_mean - mate_ref_start)
                if dist < best_dist and dist <= config.cluster_merge_bnd * 2 and group.bnd_mate_contig == mate_contig:
                    if not config.combine_separate_intra or svcand.sample_internal_id not in group.included_samples:
                        best_group = group
                        best_dist = dist
        else:
            for group in groups:
                dist = abs(group.pos_mean - svcand.pos) + abs(abs(group.len_mean) - abs(svcand.svlen))
                minlen = float(min(abs(group.len_mean), abs(svcand.svlen)))
                if (minlen > 0 and dist < best_dist and dist <= config.combine_match * math.sqrt(minlen)
                        and dist <= config.combine_match_max):
                    if ((not config.combine_separate_intra
                         or svcand.sample_internal_id not in group.included_samples)
                            and group.align_call(svcand, config.combine_pctseq, ed_cache)):
                        best_group = group
                        best_dist = dist

        if best_group is None:
            groups.append(sv.SVGroup.from_candidate(svcand))
        else:
            best_group.add_candidate(svcand)
    return groups


from sniffles_tpu.compat import alias_module_for_pickle

alias_module_for_pickle("sniffles.cluster", __name__, [Cluster])
