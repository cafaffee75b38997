// bamcore: native BAM decoding hot path for sniffles-tpu.
//
// Replaces the per-read Python work of the reference's hot loops
// (reference: leadprov.py:488-571 per-read fetch/filter loop and
// :602-670 per-CIGAR-op scan — the wall-clock dominant code on a 30x
// genome). The reference gets this from htslib via pysam; this
// environment has no htslib, so the BGZF inflate and record scan are
// implemented here directly against zlib.
//
// Exposed C ABI (loaded from Python via ctypes, io/native.py):
//   bamcore_bgzf_inflate   — decompress a BGZF byte range
//   bamcore_scan_records   — single pass over decompressed alignment
//                            records: per-record geometry, tag extraction
//                            (NM/SA/HP/PS), CIGAR indel/clip events
//
// Build: make -C native   (produces libbamcore.so)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// BGZF
// ---------------------------------------------------------------------------

// Decompress consecutive BGZF blocks from `raw` into `out`.
// Returns 0 on success; fills *out_len with decompressed size.
int bamcore_bgzf_inflate(const uint8_t* raw, int64_t raw_len,
                         uint8_t* out, int64_t out_cap, int64_t* out_len) {
    int64_t in_off = 0;
    int64_t out_off = 0;
    while (in_off + 18 <= raw_len) {
        if (raw[in_off] != 0x1f || raw[in_off + 1] != 0x8b) return -1;
        uint16_t xlen;
        std::memcpy(&xlen, raw + in_off + 10, 2);
        // find BSIZE in extra subfields
        int64_t ext = in_off + 12;
        int64_t ext_end = ext + xlen;
        int32_t bsize = -1;
        while (ext + 4 <= ext_end) {
            uint8_t si1 = raw[ext], si2 = raw[ext + 1];
            uint16_t slen;
            std::memcpy(&slen, raw + ext + 2, 2);
            if (si1 == 66 && si2 == 67) {
                uint16_t bs;
                std::memcpy(&bs, raw + ext + 4, 2);
                bsize = (int32_t)bs + 1;
                break;
            }
            ext += 4 + slen;
        }
        if (bsize < 0) return -2;
        int64_t cdata_off = in_off + 12 + xlen;
        int64_t cdata_len = bsize - 12 - xlen - 8;
        if (in_off + bsize > raw_len) break;  // truncated tail block

        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -15) != Z_OK) return -3;
        zs.next_in = const_cast<Bytef*>(raw + cdata_off);
        zs.avail_in = (uInt)cdata_len;
        zs.next_out = out + out_off;
        zs.avail_out = (uInt)(out_cap - out_off);
        int ret = inflate(&zs, Z_FINISH);
        int64_t produced = (int64_t)zs.total_out;
        inflateEnd(&zs);
        if (ret != Z_STREAM_END) return -4;
        out_off += produced;
        in_off += bsize;
    }
    *out_len = out_off;
    return 0;
}

// Multithreaded BGZF inflate: blocks are independent deflate streams, so
// worker threads pull blocks from a shared counter and write into
// precomputed output offsets (from the ISIZE header walk done in Python).
int bamcore_bgzf_inflate_mt(const uint8_t* raw,
                            const int64_t* block_in_off,   // [n_blocks]
                            const int32_t* block_in_len,   // [n_blocks] (BSIZE)
                            const int64_t* block_out_off,  // [n_blocks]
                            int64_t n_blocks,
                            uint8_t* out, int64_t out_cap,
                            int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    std::atomic<int64_t> next(0);
    std::atomic<int> err(0);

    auto worker = [&]() {
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -15) != Z_OK) { err.store(-3); return; }
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n_blocks || err.load() != 0) break;
            int64_t in_off = block_in_off[i];
            int32_t bsize = block_in_len[i];
            // locate cdata inside the block (12-byte header + xlen extra)
            uint16_t xlen;
            std::memcpy(&xlen, raw + in_off + 10, 2);
            int64_t cdata_off = in_off + 12 + xlen;
            int64_t cdata_len = bsize - 12 - xlen - 8;
            if (block_out_off[i] >= out_cap) { err.store(-5); break; }
            if (inflateReset(&zs) != Z_OK) { err.store(-3); break; }
            zs.next_in = const_cast<Bytef*>(raw + cdata_off);
            zs.avail_in = (uInt)cdata_len;
            zs.next_out = out + block_out_off[i];
            zs.avail_out = (uInt)(out_cap - block_out_off[i]);
            int ret = inflate(&zs, Z_FINISH);
            if (ret != Z_STREAM_END) { err.store(-4); break; }
        }
        inflateEnd(&zs);
    };

    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return err.load();
}

// ---------------------------------------------------------------------------
// Record scan
// ---------------------------------------------------------------------------

// CIGAR op consumption tables (reference: leadprov.py:180-195 OPTAB)
static const int CONSUME_READ[9] = {1, 1, 0, 0, 1, 0, 0, 1, 1};
static const int CONSUME_REF[9] = {1, 0, 1, 1, 0, 0, 0, 1, 1};

enum { OP_M = 0, OP_I = 1, OP_D = 2, OP_N = 3, OP_S = 4, OP_H = 5, OP_P = 6, OP_EQ = 7, OP_X = 8 };

struct RecordCols {
    int64_t* offset;      // byte offset of record body (after block_size)
    int32_t* rec_len;
    int32_t* refid;
    int32_t* pos;
    int32_t* flag;
    int32_t* mapq;
    int32_t* ref_len;     // reference span
    int32_t* qstart;      // leading soft clip
    int32_t* qalen;       // aligned query length (M/I/=/X)
    int32_t* l_seq;
    int32_t* nm;          // NM tag or -1
    int32_t* hp;          // HP tag or 0
    int32_t* ps;          // PS tag or -1 (NULL)
    int64_t* sa_off;      // offset of SA string value, -1 if absent
    int32_t* sa_len;
    int32_t* large_indel_sum;  // sum of ins+del ops > nm_adjust_oplen
    int64_t* name_off;
    int32_t* name_len;
    int64_t* seq_off;     // offset of packed 4-bit seq
};

struct EventCols {
    int32_t* rec_index;
    int32_t* op;       // CIGAR op
    int32_t* oplen;
    int32_t* pos_ref;  // reference position of the event
    int32_t* pos_read; // read position of the event
};

// Scan alignment records from decompressed buffer [data, data+len).
// Emits per-record columns and CIGAR events (I/D/S/H ops with
// oplen >= min_event_len). Returns number of records scanned, or < 0 on
// error. Stops early when capacities are reached (callers size
// generously and retry on the -9 / -10 sentinel).
int64_t bamcore_scan_records(const uint8_t* data, int64_t len,
                             int32_t min_event_len, int32_t nm_adjust_oplen,
                             RecordCols* rc, int64_t rec_cap,
                             EventCols* ec, int64_t ev_cap,
                             int64_t* n_events_out) {
    int64_t off = 0;
    int64_t nrec = 0;
    int64_t nev = 0;

    while (off + 4 <= len) {
        int32_t block_size;
        std::memcpy(&block_size, data + off, 4);
        if (block_size < 32 || off + 4 + block_size > len) break;
        const uint8_t* r = data + off + 4;

        if (nrec >= rec_cap) return -9;

        int32_t refid, pos, l_seq, next_refid, next_pos, tlen;
        std::memcpy(&refid, r, 4);
        std::memcpy(&pos, r + 4, 4);
        uint8_t l_read_name = r[8];
        uint8_t mapq = r[9];
        uint16_t n_cigar, flag;
        std::memcpy(&n_cigar, r + 12, 2);
        std::memcpy(&flag, r + 14, 2);
        std::memcpy(&l_seq, r + 16, 4);
        std::memcpy(&next_refid, r + 20, 4);
        std::memcpy(&next_pos, r + 24, 4);
        std::memcpy(&tlen, r + 28, 4);

        const uint8_t* name = r + 32;
        const uint8_t* cig = name + l_read_name;
        const uint8_t* seq = cig + 4ll * n_cigar;
        int64_t seq_bytes = (l_seq + 1) / 2;
        const uint8_t* qual = seq + seq_bytes;
        const uint8_t* tags = qual + l_seq;
        const uint8_t* rec_end = r + block_size;

        // CIGAR walk: geometry + events
        int32_t ref_len = 0, qstart = 0, qalen = 0;
        int32_t large_sum = 0;
        int32_t pos_read = 0, pos_ref = pos;
        bool seen_aligned = false;
        for (uint32_t ci = 0; ci < n_cigar; ci++) {
            uint32_t cv;
            std::memcpy(&cv, cig + 4ll * ci, 4);
            uint32_t op = cv & 0xF;
            int32_t oplen = (int32_t)(cv >> 4);
            if (op > 8) continue;
            ref_len += CONSUME_REF[op] * oplen;
            if (op == OP_M || op == OP_I || op == OP_EQ || op == OP_X) {
                qalen += oplen;
                seen_aligned = true;
            } else if (op == OP_S && !seen_aligned) {
                qstart += oplen;
            }
            if ((op == OP_I || op == OP_D) && oplen > nm_adjust_oplen)
                large_sum += oplen;
            if ((op == OP_I || op == OP_D || op == OP_S || op == OP_H) && oplen >= min_event_len) {
                if (nev >= ev_cap) return -10;
                ec->rec_index[nev] = (int32_t)nrec;
                ec->op[nev] = (int32_t)op;
                ec->oplen[nev] = oplen;
                ec->pos_ref[nev] = pos_ref;
                ec->pos_read[nev] = pos_read;
                nev++;
            }
            pos_read += CONSUME_READ[op] * oplen;
            pos_ref += CONSUME_REF[op] * oplen;
        }

        // tag walk: NM / SA / HP / PS
        int32_t nm = -1, hp = 0, ps = -1;
        int64_t sa_off = -1;
        int32_t sa_len = 0;
        const uint8_t* t = tags;
        while (t + 3 <= rec_end) {
            char t0 = (char)t[0], t1 = (char)t[1], typ = (char)t[2];
            const uint8_t* v = t + 3;
            int64_t vlen = 0;
            int64_t ival = 0;
            bool is_int = false;
            switch (typ) {
                case 'A': vlen = 1; break;
                case 'c': { int8_t x; std::memcpy(&x, v, 1); ival = x; is_int = true; vlen = 1; break; }
                case 'C': { uint8_t x = *v; ival = x; is_int = true; vlen = 1; break; }
                case 's': { int16_t x; std::memcpy(&x, v, 2); ival = x; is_int = true; vlen = 2; break; }
                case 'S': { uint16_t x; std::memcpy(&x, v, 2); ival = x; is_int = true; vlen = 2; break; }
                case 'i': { int32_t x; std::memcpy(&x, v, 4); ival = x; is_int = true; vlen = 4; break; }
                case 'I': { uint32_t x; std::memcpy(&x, v, 4); ival = (int64_t)x; is_int = true; vlen = 4; break; }
                case 'f': vlen = 4; break;
                case 'Z': case 'H': {
                    const uint8_t* z = v;
                    while (z < rec_end && *z != 0) z++;
                    vlen = (z - v) + 1;
                    break;
                }
                case 'B': {
                    char sub = (char)v[0];
                    uint32_t cnt;
                    std::memcpy(&cnt, v + 1, 4);
                    int esz = (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
                    vlen = 5 + (int64_t)cnt * esz;
                    break;
                }
                default:
                    vlen = rec_end - v;  // unknown: stop
            }
            if (t0 == 'N' && t1 == 'M' && is_int) nm = (int32_t)ival;
            else if (t0 == 'H' && t1 == 'P' && is_int) hp = (int32_t)ival;
            else if (t0 == 'P' && t1 == 'S' && is_int) ps = (int32_t)ival;
            else if (t0 == 'S' && t1 == 'A' && (typ == 'Z')) {
                sa_off = (v - data);
                sa_len = (int32_t)(vlen - 1);
            }
            t = v + vlen;
        }

        rc->offset[nrec] = off + 4;
        rc->rec_len[nrec] = block_size;
        rc->refid[nrec] = refid;
        rc->pos[nrec] = pos;
        rc->flag[nrec] = flag;
        rc->mapq[nrec] = mapq;
        rc->ref_len[nrec] = ref_len;
        rc->qstart[nrec] = qstart;
        rc->qalen[nrec] = qalen;
        rc->l_seq[nrec] = l_seq;
        rc->nm[nrec] = nm;
        rc->hp[nrec] = hp;
        rc->ps[nrec] = ps;
        rc->sa_off[nrec] = sa_off;
        rc->sa_len[nrec] = sa_len;
        rc->large_indel_sum[nrec] = large_sum;
        rc->name_off[nrec] = (name - data);
        rc->name_len[nrec] = l_read_name - 1;
        rc->seq_off[nrec] = (seq - data);
        nrec++;
        off += 4 + block_size;
    }
    *n_events_out = nev;
    return nrec;
}

// Decode a slice of 4-bit packed sequence into ASCII.
void bamcore_decode_seq(const uint8_t* packed, int64_t l_seq,
                        int64_t start, int64_t end, char* out) {
    static const char NT16[] = "=ACMGRSVTWYHKDBN";
    for (int64_t i = start; i < end && i < l_seq; i++) {
        uint8_t b = packed[i >> 1];
        out[i - start] = NT16[(i & 1) ? (b & 0xF) : (b >> 4)];
    }
}

// Global (NW) Levenshtein distance, Myers bit-parallel over uint64
// blocks. Exact equivalent of the Python big-int implementation in
// ops/edit_distance.py (which replaces edlib for the INS merge gates,
// reference: sv.py:287, snfp.py:103); ~100x faster for kb-scale
// sequences since Python big-int ops are O(words) interpreted.
int64_t bamcore_edit_distance(const uint8_t* a, int64_t m,
                              const uint8_t* b, int64_t n) {
    if (m == 0) return n;
    if (n == 0) return m;
    const int64_t kw = (m + 63) / 64;
    const int mbits = (int)(m - 64 * (kw - 1));
    const uint64_t mask_last =
        (mbits == 64) ? ~0ULL : ((1ULL << mbits) - 1ULL);
    const int top = mbits - 1;

    // thread-local scratch; only the symbol rows actually referenced are
    // cleared (DNA alphabets touch ~5 of the 256 rows)
    static thread_local std::vector<uint64_t> peq;
    static thread_local std::vector<uint64_t> state;
    if (peq.size() < (size_t)kw * 256) peq.assign((size_t)kw * 256, 0);
    if (state.size() < (size_t)kw * 2) state.resize((size_t)kw * 2);
    bool seen[256] = {false};
    for (int64_t i = 0; i < m; i++) seen[a[i]] = true;
    for (int64_t j = 0; j < n; j++) seen[b[j]] = true;
    for (int c = 0; c < 256; c++)
        if (seen[c]) memset(&peq[(size_t)kw * c], 0, (size_t)kw * 8);
    for (int64_t i = 0; i < m; i++)
        peq[(size_t)kw * a[i] + (i >> 6)] |= 1ULL << (i & 63);

    uint64_t* pv = &state[0];
    uint64_t* mv = &state[kw];
    for (int64_t w = 0; w < kw; w++) { pv[w] = ~0ULL; mv[w] = 0; }
    pv[kw - 1] = mask_last;
    int64_t score = m;

    // single low-to-high word pass per text char: the add carry and both
    // shift carries all propagate in the same direction
    for (int64_t j = 0; j < n; j++) {
        const uint64_t* eq = &peq[(size_t)kw * b[j]];
        unsigned __int128 addc = 0;
        uint64_t phc = 1, mhc = 0;
        for (int64_t w = 0; w < kw; w++) {
            const uint64_t eqw = eq[w], pvw = pv[w], mvw = mv[w];
            const uint64_t ep = eqw & pvw;
            const unsigned __int128 s = (unsigned __int128)ep + pvw + addc;
            addc = s >> 64;
            const uint64_t xhw = ((uint64_t)s ^ pvw) | eqw;
            const uint64_t xvw = eqw | mvw;
            uint64_t phw = mvw | ~(xhw | pvw);
            const uint64_t mhw = pvw & xhw;
            if (w == kw - 1) {
                phw &= mask_last;
                score += (int64_t)((phw >> top) & 1);
                score -= (int64_t)((mhw >> top) & 1);
            }
            uint64_t ph_sh = (phw << 1) | phc;
            phc = phw >> 63;
            const uint64_t mh_sh = (mhw << 1) | mhc;
            mhc = mhw >> 63;
            if (w == kw - 1) ph_sh &= mask_last;
            mv[w] = ph_sh & xvw;
            uint64_t pvn = mh_sh | ~(xvw | ph_sh);
            if (w == kw - 1) pvn &= mask_last;
            pv[w] = pvn;
        }
    }
    return score;
}

// Fused coverage accumulation: running prefix sum over a difference
// array, added in place into a uint16 coverage track. Replaces
// numpy's scalar cumsum + astype + += chain (the per-base coverage
// build, reference: leadprov.py:508-515), which is the second-largest
// host cost on wide scans.
void bamcore_prefix_add_u16(const int32_t* diff, uint16_t* cov, int64_t n) {
    int32_t running = 0;
    for (int64_t i = 0; i < n; i++) {
        running += diff[i];
        cov[i] = (uint16_t)(cov[i] + (uint16_t)running);
    }
}

}  // extern "C"
