// C++ AAC-LC host syntax parser.
//
// Production port of the Python reference in codecs/aac_lc.py (which
// itself is the parity rebuild of soundkit-aac-lc's host layer): ADTS
// AU parse -> device-ready lane tensors (quantized spectra, per-line
// scales, M/S masks, intensity factors, TNS lpc/regions/permutation,
// window metadata) in exactly the FrameBatch layout consumed by
// ops/aac_batch.py.  The Python parser stays as the executable spec;
// this path removes it from the serving hot loop.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <vector>

#include "../generated/aac_tables.h"

namespace {

constexpr int MAX_ORDER = 20;
constexpr int MAX_FILTERS = 8;

struct BitReader {
    const uint8_t* data;
    long nbytes;
    long nbits;
    long pos = 0;
    bool bad = false;

    BitReader(const uint8_t* d, long len) : data(d), nbytes(len), nbits(len * 8) {}

    // 32-bit window starting at bit `pos` (MSB-first), zero-padded past EOF
    inline uint32_t window32(long p) const {
        long byte = p >> 3;
        if (byte + 8 <= nbytes) {  // hot path: one unaligned 64-bit load
            uint64_t w;
            memcpy(&w, data + byte, 8);
            w = __builtin_bswap64(w);
            return (uint32_t)(w >> (32 - (p & 7)));
        }
        uint64_t w = 0;
        for (int i = 0; i < 5; ++i) {
            uint64_t b = (byte + i) < nbytes ? data[byte + i] : 0;
            w = (w << 8) | b;
        }
        return (uint32_t)(w >> (8 - (p & 7)));
    }

    inline uint32_t get(int n) {
        if (pos + n > nbits) { bad = true; pos = nbits; return 0; }
        uint32_t v = n ? (window32(pos) >> (32 - n)) : 0;
        pos += n;
        return v;
    }

    inline uint32_t peek(int n) const {
        return n ? (window32(pos) >> (32 - n)) : 0;
    }

    long left() const { return nbits - pos; }
};

struct Vlc {
    int max_len = 0;
    // one packed entry per prefix: (sym << 8) | code_len; -1 = invalid.
    // A single load per decode (sym+len used to live in two vectors =
    // two cache lines per read on the hottest loop in the parser).
    std::vector<int32_t> tab;

    void build(const uint32_t* codes32, const uint16_t* codes16,
               const uint8_t* bits, int n) {
        max_len = 0;
        for (int i = 0; i < n; ++i) max_len = std::max<int>(max_len, bits[i]);
        tab.assign(1u << max_len, -1);
        for (int i = 0; i < n; ++i) {
            uint32_t c = codes32 ? codes32[i] : codes16[i];
            int l = bits[i];
            uint32_t base = c << (max_len - l);
            uint32_t span = 1u << (max_len - l);
            for (uint32_t j = 0; j < span; ++j)
                tab[base + j] = (int32_t)((i << 8) | l);
        }
    }

    int read(BitReader& br) const {
        int32_t e = tab[br.peek(max_len)];
        if (e < 0) { br.bad = true; return 0; }
        br.pos += e & 0xFF;
        return e >> 8;
    }
};

struct Tables {
    Vlc spectral[11];
    Vlc sf;
    bool ready = false;

    void init() {
        if (ready) return;
        for (int i = 0; i < 11; ++i)
            spectral[i].build(nullptr, AAC_SPECTRAL_CODES[i], AAC_SPECTRAL_BITS[i],
                              AAC_SPECTRAL_SIZES[i]);
        sf.build(AAC_SF_CODE, nullptr, AAC_SF_BITS, 121);
        ready = true;
    }
};

Tables g_tables;

// codebook properties
struct CbInfo { int dim; int base; bool sign; };
static const CbInfo CB[12] = {
    {0,0,false}, {4,3,true}, {4,3,true}, {4,3,false}, {4,3,false},
    {2,9,true}, {2,9,true}, {2,8,false}, {2,8,false},
    {2,13,false}, {2,13,false}, {2,17,false},
};

// per-channel lane output (matches FrameBatch lane layout)
struct LaneOut {
    int32_t quant[1024];
    int16_t quant16[1024];  // compact wire (written when !full)
    float scale[1024];
    int32_t perm[1024];
    int32_t filt_id[1024];
    float lpc[MAX_FILTERS][MAX_ORDER];
    int32_t seq;
    int32_t shape;
    int32_t valid;
    int32_t overflow;  // |quant| exceeded int16 (compact path)
};

struct FrameOut {
    LaneOut ch[2];
    uint8_t ms_mask[1024];
    float int_factor[1024];
    int8_t int_pos[1024];    // intensity position per line (compact wire)
    int8_t int_sign[1024];   // -1/0/+1 incl. ms inversion
    uint8_t line_sf[2][1024];  // sf per line, 0 = silent (compact wire)
    int16_t regions[2][MAX_FILTERS][3];  // start, end, direction
    int32_t n_channels;
    int32_t element_kind;  // 0 sce, 1 cpe, 3 lfe
    char error[128];
};

struct IcsInfo {
    int window_sequence = 0;
    int window_shape = 0;
    int max_sfb = 0;
    int num_windows = 1;
    int num_window_groups = 1;
    int group_lens[8] = {1};
    int num_swb = 0;
    const uint16_t* swb = nullptr;
};

struct TnsFilt {
    int length, order, direction;
    float coefs[MAX_ORDER];
};

struct IcsData {
    IcsInfo info;
    int global_gain = 0;
    int band_type[8][64];
    double band_scale[8][64];
    int band_sf[8][64];      // integer sf (or noise sf); -1 = silent
    int n_tns[8] = {0};
    TnsFilt tns[8][4];
    int32_t quant[1024];
};

struct Parser {
    int sr_index;
    char error[128] = {0};
    uint32_t pns_state = 0x12345678u;  // PNS sign-noise LCG

    bool fail(const char* msg) {
        snprintf(error, sizeof error, "%s", msg);
        return false;
    }

    bool decode_ics_info(BitReader& br, IcsInfo& ii) {
        if (br.get(1)) return fail("ics_reserved_bit set");
        ii.window_sequence = br.get(2);
        ii.window_shape = br.get(1);
        if (ii.window_sequence == 2) {
            ii.max_sfb = br.get(4);
            uint32_t grouping = br.get(7);
            ii.num_windows = 8;
            ii.num_window_groups = 1;
            ii.group_lens[0] = 1;
            for (int b = 6; b >= 0; --b) {
                if ((grouping >> b) & 1) {
                    ii.group_lens[ii.num_window_groups - 1] += 1;
                } else {
                    ii.group_lens[ii.num_window_groups++] = 1;
                }
            }
            ii.num_swb = AAC_NUM_SWB_128[sr_index];
            ii.swb = AAC_SWB_128[sr_index];
        } else {
            ii.max_sfb = br.get(6);
            if (br.get(1)) return fail("predictor/LTP not supported");
            ii.num_windows = 1;
            ii.num_window_groups = 1;
            ii.group_lens[0] = 1;
            ii.num_swb = AAC_NUM_SWB_1024[sr_index];
            ii.swb = AAC_SWB_1024[sr_index];
        }
        if (ii.max_sfb > ii.num_swb) return fail("max_sfb exceeds num_swb");
        return true;
    }

    bool decode_ics(BitReader& br, bool common, const IcsInfo* shared, IcsData& ics,
                    double* is_scale /* [8][64] out for intensity */,
                    int* is_sign /* [8][64] */,
                    int* is_ipos /* [8][64] */) {
        ics.global_gain = (int)br.get(8);
        if (common) ics.info = *shared;
        else if (!decode_ics_info(br, ics.info)) return false;

        const IcsInfo& ii = ics.info;
        bool short_win = ii.window_sequence == 2;
        int bits = short_win ? 3 : 5;
        int esc = (1 << bits) - 1;

        memset(ics.band_type, 0, sizeof ics.band_type);
        memset(ics.band_scale, 0, sizeof ics.band_scale);
        for (int g = 0; g < ii.num_window_groups; ++g) {
            int k = 0;
            while (k < ii.max_sfb) {
                int cb = (int)br.get(4);
                if (cb == 12) return fail("invalid codebook 12");
                int run = 0, incr;
                do { incr = (int)br.get(bits); run += incr; } while (incr == esc);
                // an exhausted reader returns 0 without advancing, so a
                // zero-length run must bail or this loop never ends
                // (fuzz: 21-byte AU spun forever here)
                if (br.bad) return fail("bitstream overrun");
                if (k + run > ii.max_sfb) return fail("section overrun");
                for (int s = k; s < k + run; ++s) ics.band_type[g][s] = cb;
                k += run;
            }
        }

        int sf = ics.global_gain, is_pos = 0, noise = ics.global_gain - 90;
        bool noise_first = true;
        for (int g = 0; g < 8; ++g)
            for (int s = 0; s < 64; ++s) ics.band_sf[g][s] = -1;
        for (int g = 0; g < ii.num_window_groups; ++g) {
            for (int s = 0; s < ii.max_sfb; ++s) {
                int cb = ics.band_type[g][s];
                if (cb == 0) continue;
                if (cb == 14 || cb == 15) {
                    is_pos += g_tables.sf.read(br) - 60;
                    is_scale[g * 64 + s] = std::pow(2.0, -0.25 * is_pos);
                    is_sign[g * 64 + s] = (cb == 14) ? -1 : 1;
                    is_ipos[g * 64 + s] = is_pos;
                } else if (cb == 13) {
                    if (noise_first) { noise += (int)br.get(9) - 256; noise_first = false; }
                    else noise += g_tables.sf.read(br) - 60;
                    ics.band_scale[g][s] = std::pow(2.0, 0.25 * (noise - 100));
                    // clamp into the u8 line_sf wire (0 means silent)
                    ics.band_sf[g][s] = noise < 1 ? 1 : (noise > 255 ? 255 : noise);
                } else {
                    sf += g_tables.sf.read(br) - 60;
                    if (sf < 0 || sf > 255) return fail("scalefactor out of range");
                    ics.band_scale[g][s] = std::pow(2.0, 0.25 * (sf - 100));
                    ics.band_sf[g][s] = sf;
                }
                if (br.bad) return fail("bitstream overrun");
            }
        }

        // pulse
        int n_pulse = 0, pulse_pos[4], pulse_amp[4];
        if (br.get(1)) {
            if (short_win) return fail("pulse in short window");
            n_pulse = (int)br.get(2) + 1;
            int start_sfb = (int)br.get(6);
            if (start_sfb >= ii.num_swb) return fail("pulse start out of range");
            int pos = ii.swb[start_sfb];
            for (int p = 0; p < n_pulse; ++p) {
                pos += (int)br.get(5);
                pulse_pos[p] = pos;
                pulse_amp[p] = (int)br.get(4);
            }
        }

        // tns
        memset(ics.n_tns, 0, sizeof ics.n_tns);
        if (br.get(1)) {
            for (int w = 0; w < ii.num_windows; ++w) {
                int n_filt = (int)br.get(short_win ? 1 : 2);
                int coef_res = n_filt ? (int)br.get(1) : 0;
                for (int f = 0; f < n_filt; ++f) {
                    TnsFilt& tf = ics.tns[w][f];
                    tf.length = (int)br.get(short_win ? 4 : 6);
                    tf.order = (int)br.get(short_win ? 3 : 5);
                    tf.direction = 0;
                    if (tf.order) {
                        tf.direction = (int)br.get(1);
                        int compress = (int)br.get(1);
                        int coef_len = coef_res + 3 - compress;
                        int crb = coef_res + 3;
                        double iqfac = ((1 << (crb - 1)) - 0.5) / (M_PI / 2.0);
                        double iqfac_m = ((1 << (crb - 1)) + 0.5) / (M_PI / 2.0);
                        for (int i = 0; i < tf.order && i < MAX_ORDER; ++i) {
                            int c = (int)br.get(coef_len);
                            if (c >= 1 << (coef_len - 1)) c -= 1 << coef_len;
                            tf.coefs[i] = (float)std::sin(c / (c >= 0 ? iqfac : iqfac_m));
                        }
                    }
                }
                ics.n_tns[w] = n_filt;
            }
        }

        if (br.get(1)) return fail("gain control (SSR) not supported");

        // spectral data
        memset(ics.quant, 0, sizeof ics.quant);
        int win_base[8];
        int acc = 0;
        for (int g = 0; g < ii.num_window_groups; ++g) { win_base[g] = acc; acc += ii.group_lens[g]; }
        for (int g = 0; g < ii.num_window_groups; ++g) {
            for (int s = 0; s < ii.max_sfb; ++s) {
                int cb = ics.band_type[g][s];
                if (cb == 0 || cb >= 13) continue;
                int lo = ii.swb[s], hi = ii.swb[s + 1];
                const Vlc& vlc = g_tables.spectral[cb - 1];
                const CbInfo& ci = CB[cb];
                for (int w = 0; w < ii.group_lens[g]; ++w) {
                    int off = short_win ? (win_base[g] + w) * 128 : 0;
                    for (int k = lo; k < hi; k += ci.dim) {
                        int idx = vlc.read(br);
                        if (br.bad) return fail("spectral overrun");
                        int vals[4];
                        int tmp = idx;
                        for (int d = ci.dim - 1; d >= 0; --d) {
                            vals[d] = tmp % ci.base;
                            tmp /= ci.base;
                        }
                        if (ci.sign) {
                            int offv = (ci.base - 1) / 2;
                            for (int d = 0; d < ci.dim; ++d) vals[d] -= offv;
                        } else {
                            for (int d = 0; d < ci.dim; ++d)
                                if (vals[d] && br.get(1)) vals[d] = -vals[d];
                        }
                        if (cb == 11) {
                            for (int d = 0; d < ci.dim; ++d) {
                                if (vals[d] == 16 || vals[d] == -16) {
                                    int n = 4;
                                    while (br.get(1)) { if (++n > 28) return fail("escape overflow"); }
                                    int mag = (1 << n) | (int)br.get(n);
                                    vals[d] = vals[d] > 0 ? mag : -mag;
                                }
                            }
                        }
                        for (int d = 0; d < ci.dim; ++d) ics.quant[off + k + d] = vals[d];
                    }
                }
            }
        }
        for (int p = 0; p < n_pulse; ++p) {
            if (pulse_pos[p] >= 1024) return fail("pulse position out of range");
            int32_t& q = ics.quant[pulse_pos[p]];
            q += (q > 0) ? pulse_amp[p] : -pulse_amp[p];
        }
        return !br.bad || !fail("bitstream overrun");
    }

    void fill_lane(const IcsData& ics, LaneOut& lane,
                   uint8_t* line_sf, int16_t (*regions)[3], bool full = true) {
        const IcsInfo& ii = ics.info;
        bool short_win = ii.window_sequence == 2;
        if (full) {
            memcpy(lane.quant, ics.quant, sizeof lane.quant);
            memset(lane.scale, 0, sizeof lane.scale);
            for (int i = 0; i < 1024; ++i) lane.perm[i] = i;
            for (int i = 0; i < 1024; ++i) lane.filt_id[i] = -1;
        } else {
            // compact wire: i16 quant only; scale/perm/filt are
            // reconstructed on device from line_sf/regions/seq
            lane.overflow = 0;
            for (int i = 0; i < 1024; ++i) {
                int32_t v = ics.quant[i];
                if (v > 32767 || v < -32768) {
                    lane.overflow = 1;
                    v = v > 0 ? 32767 : -32768;
                }
                lane.quant16[i] = (int16_t)v;
            }
        }
        memset(lane.lpc, 0, sizeof lane.lpc);
        lane.seq = ii.window_sequence;
        lane.shape = ii.window_shape;
        lane.valid = 1;

        memset(line_sf, 0, 1024);
        int wbase = 0;
        for (int g = 0; g < ii.num_window_groups; ++g) {
            for (int s = 0; s < ii.max_sfb; ++s) {
                int cb = ics.band_type[g][s];
                if (cb == 0 || cb == 14 || cb == 15) continue;
                bool pns = cb == 13;
                int lo = ii.swb[s], hi = ii.swb[s + 1];
                for (int w = 0; w < ii.group_lens[g]; ++w) {
                    int off = short_win ? (wbase + w) * 128 : 0;
                    for (int k = lo; k < hi; ++k) {
                        if (full) lane.scale[off + k] = (float)ics.band_scale[g][s];
                        int sfv = ics.band_sf[g][s];
                        line_sf[off + k] = (uint8_t)(sfv > 0 ? sfv : 0);
                        if (pns) {
                            // perceptual noise substitution as sign
                            // noise on the quant wire: |+-1|^(4/3) = 1
                            // so coef = +-scale, band energy n*scale^2
                            // (exactly the host apply_pns target); the
                            // RNG is unspecified by the spec
                            pns_state = pns_state * 1664525u + 1013904223u;
                            int32_t v = (pns_state >> 16) & 1 ? 1 : -1;
                            if (full) lane.quant[off + k] = v;
                            else lane.quant16[off + k] = (int16_t)v;
                        }
                    }
                }
            }
            wbase += ii.group_lens[g];
        }
        for (int f = 0; f < MAX_FILTERS; ++f)
            regions[f][0] = regions[f][1] = regions[f][2] = 0;

        // tns -> filt ids / lpc / perm
        int tmax = short_win ? AAC_TNS_MAX_128[sr_index] : AAC_TNS_MAX_1024[sr_index];
        int mmax = std::min(tmax, ii.max_sfb);
        int nf = 0;
        for (int w = 0; w < ii.num_windows; ++w) {
            int bottom = ii.num_swb;
            for (int f = 0; f < ics.n_tns[w]; ++f) {
                const TnsFilt& tf = ics.tns[w][f];
                int top = bottom;
                bottom = std::max(0, top - tf.length);
                int order = std::min(tf.order, MAX_ORDER);
                if (!order || nf >= MAX_FILTERS) continue;
                int start = ii.swb[std::min(bottom, mmax)];
                int end = ii.swb[std::min(top, mmax)];
                if (end - start <= 0) continue;
                int off = short_win ? w * 128 : 0;
                // parcor -> lpc
                double lpc[MAX_ORDER] = {0};
                for (int m = 0; m < order; ++m) {
                    double kk = tf.coefs[m];
                    double nw[MAX_ORDER];
                    for (int i = 0; i < m; ++i) nw[i] = lpc[i] + kk * lpc[m - 1 - i];
                    nw[m] = kk;
                    for (int i = 0; i <= m; ++i) lpc[i] = nw[i];
                }
                for (int i = 0; i < order; ++i) lane.lpc[nf][i] = (float)lpc[i];
                if (full) {
                    for (int i = off + start; i < off + end; ++i) lane.filt_id[i] = nf;
                    if (tf.direction) {
                        int a = off + start, b = off + end - 1;
                        for (int i = 0; a + i <= b; ++i) lane.perm[a + i] = b - i;
                    }
                }
                regions[nf][0] = (int16_t)(off + start);
                regions[nf][1] = (int16_t)(off + end);
                regions[nf][2] = (int16_t)tf.direction;
                ++nf;
            }
        }
    }

    bool parse_au(const uint8_t* au, long len, FrameOut& out, bool full = true) {
        g_tables.init();
        BitReader br(au, len);
        memset(out.ms_mask, 0, sizeof out.ms_mask);
        if (full) memset(out.int_factor, 0, sizeof out.int_factor);
        out.ch[0].valid = out.ch[1].valid = 0;
        out.n_channels = 0;
        out.error[0] = 0;

        while (br.left() >= 3) {
            int ide = (int)br.get(3);
            if (ide == 7) break;
            if (ide == 0 || ide == 3) {  // SCE / LFE
                br.get(4);
                IcsData ics;
                // intensity arrays are written before any read (every
                // cb 14/15 band is filled in the scalefactor pass), so
                // no 12KB stack zeroing on the per-AU hot path
                double is_scale[8 * 64];
                int is_sign[8 * 64];
                int is_ipos[8 * 64];
                if (!decode_ics(br, false, nullptr, ics, is_scale, is_sign, is_ipos)) {
                    snprintf(out.error, sizeof out.error, "%s", error);
                    return false;
                }
                fill_lane(ics, out.ch[0], out.line_sf[0], out.regions[0], full);
                memset(out.int_pos, 0, sizeof out.int_pos);
                memset(out.int_sign, 0, sizeof out.int_sign);
                out.n_channels = 1;
                out.element_kind = ide;
                return true;  // single-track decode: first element
            }
            if (ide == 1) {  // CPE
                br.get(4);
                int common = (int)br.get(1);
                IcsInfo shared;
                uint8_t ms_band[8][64];
                memset(ms_band, 0, sizeof ms_band);
                int ms_present = 0;
                if (common) {
                    if (!decode_ics_info(br, shared)) {
                        snprintf(out.error, sizeof out.error, "%s", error);
                        return false;
                    }
                    ms_present = (int)br.get(2);
                    if (ms_present == 1) {
                        for (int g = 0; g < shared.num_window_groups; ++g)
                            for (int s = 0; s < shared.max_sfb; ++s)
                                ms_band[g][s] = (uint8_t)br.get(1);
                    } else if (ms_present == 2) {
                        for (int g = 0; g < shared.num_window_groups; ++g)
                            for (int s = 0; s < shared.max_sfb; ++s)
                                ms_band[g][s] = 1;
                    } else if (ms_present == 3) {
                        snprintf(out.error, sizeof out.error, "reserved ms_mask_present");
                        return false;
                    }
                }
                IcsData ics0, ics1;
                // written-before-read (see SCE note): no stack zeroing
                double is_sc0[8 * 64], is_sc1[8 * 64];
                int is_sg0[8 * 64], is_sg1[8 * 64];
                int is_ip0[8 * 64], is_ip1[8 * 64];
                if (!decode_ics(br, common != 0, &shared, ics0, is_sc0, is_sg0, is_ip0) ||
                    !decode_ics(br, common != 0, &shared, ics1, is_sc1, is_sg1, is_ip1)) {
                    snprintf(out.error, sizeof out.error, "%s", error);
                    return false;
                }
                fill_lane(ics0, out.ch[0], out.line_sf[0], out.regions[0], full);
                fill_lane(ics1, out.ch[1], out.line_sf[1], out.regions[1], full);
                memset(out.int_pos, 0, sizeof out.int_pos);
                memset(out.int_sign, 0, sizeof out.int_sign);
                out.n_channels = 2;
                out.element_kind = 1;

                // ms/intensity line masks
                const IcsInfo& ii = ics0.info;
                bool short_win = ii.window_sequence == 2;
                int wbase = 0;
                for (int g = 0; g < ii.num_window_groups; ++g) {
                    for (int s = 0; s < ii.max_sfb; ++s) {
                        int bt1 = ics1.band_type[g][s];
                        int lo = ii.swb[s], hi = ii.swb[s + 1];
                        bool is_int = bt1 == 14 || bt1 == 15;
                        for (int w = 0; w < ii.group_lens[g]; ++w) {
                            int off = short_win ? (wbase + w) * 128 : 0;
                            if (is_int) {
                                double c = is_sg1[g * 64 + s];
                                if (ms_present && ms_band[g][s]) c = -c;
                                int ip = is_ip1[g * 64 + s];
                                for (int k = lo; k < hi; ++k) {
                                    if (full)
                                        out.int_factor[off + k] =
                                            (float)(c * is_sc1[g * 64 + s]);
                                    out.int_pos[off + k] =
                                        (int8_t)std::max(-128, std::min(127, ip));
                                    out.int_sign[off + k] = (int8_t)(c < 0 ? -1 : 1);
                                }
                            } else if (ms_band[g][s] &&
                                       ics0.band_type[g][s] < 13 && bt1 < 13) {
                                for (int k = lo; k < hi; ++k)
                                    out.ms_mask[off + k] = 1;
                            }
                        }
                    }
                    wbase += ii.group_lens[g];
                }
                return true;
            }
            if (ide == 4) {  // DSE
                br.get(4);
                int align = (int)br.get(1);
                int count = (int)br.get(8);
                if (count == 255) count += (int)br.get(8);
                if (align) br.pos += (8 - br.pos % 8) % 8;
                br.pos += count * 8;
            } else if (ide == 6) {  // FIL
                int count = (int)br.get(4);
                if (count == 15) count += (int)br.get(8) - 1;
                br.pos += count * 8;
            } else {
                snprintf(out.error, sizeof out.error, "unsupported element %d", ide);
                return false;
            }
            if (br.bad) {
                snprintf(out.error, sizeof out.error, "bitstream overrun");
                return false;
            }
        }
        snprintf(out.error, sizeof out.error, "empty access unit");
        return false;
    }
};

}  // namespace

extern "C" {

void* skt_aac_new(int sr_index) {
    auto* p = new Parser();
    p->sr_index = sr_index;
    return p;
}

void skt_aac_free(void* h) { delete (Parser*)h; }

// out buffers are provided by the caller (numpy arrays):
//   quant   int32 [2,1024]     scale f32 [2,1024]
//   perm    int32 [2,1024]     filt  int32 [2,1024]
//   lpc     f32   [2,8,20]     meta  int32 [8]: seq0,shape0,valid0,
//                                          seq1,shape1,valid1,nch,kind
//   ms      uint8 [1024]       intf  f32 [1024]
// returns 0 on success, -1 on parse error (see skt_aac_error)
int skt_aac_parse_au(void* h, const uint8_t* au, long len,
                     int32_t* quant, float* scale, int32_t* perm,
                     int32_t* filt, float* lpc, int32_t* meta,
                     uint8_t* ms, float* intf) {
    auto* p = (Parser*)h;
    static thread_local FrameOut out;
    if (!p->parse_au(au, len, out)) {
        snprintf(p->error, sizeof p->error, "%s", out.error);
        return -1;
    }
    for (int c = 0; c < 2; ++c) {
        const LaneOut& l = out.ch[c];
        if (c < out.n_channels) {
            memcpy(quant + c * 1024, l.quant, 1024 * 4);
            memcpy(scale + c * 1024, l.scale, 1024 * 4);
            memcpy(perm + c * 1024, l.perm, 1024 * 4);
            memcpy(filt + c * 1024, l.filt_id, 1024 * 4);
            memcpy(lpc + c * MAX_FILTERS * MAX_ORDER, l.lpc,
                   MAX_FILTERS * MAX_ORDER * 4);
            meta[c * 3 + 0] = l.seq;
            meta[c * 3 + 1] = l.shape;
            meta[c * 3 + 2] = 1;
        } else {
            memset(quant + c * 1024, 0, 1024 * 4);
            memset(scale + c * 1024, 0, 1024 * 4);
            for (int i = 0; i < 1024; ++i) perm[c * 1024 + i] = i;
            for (int i = 0; i < 1024; ++i) filt[c * 1024 + i] = -1;
            memset(lpc + c * MAX_FILTERS * MAX_ORDER, 0, MAX_FILTERS * MAX_ORDER * 4);
            meta[c * 3 + 0] = 0;
            meta[c * 3 + 1] = 0;
            meta[c * 3 + 2] = 0;
        }
    }
    meta[6] = out.n_channels;
    meta[7] = out.element_kind;
    memcpy(ms, out.ms_mask, 1024);
    memcpy(intf, out.int_factor, 1024 * 4);
    return 0;
}

const char* skt_aac_error(void* h) { return ((Parser*)h)->error; }

}  // extern "C"

extern "C" {

// Batched: parse B AUs (concatenated in `au_data` with per-lane
// offsets/lengths; len<0 = silent lane) straight into [B,...] arrays.
// Returns number of failed lanes (their valid flags stay 0).
int skt_aac_parse_batch(void* h, const uint8_t* au_data,
                        const int64_t* offsets, const int64_t* lens, int B,
                        int32_t* quant, float* scale, int32_t* perm,
                        int32_t* filt, float* lpc, int32_t* seq,
                        int32_t* shape, uint8_t* chan_valid,
                        uint8_t* ms, float* intf) {
    auto* p = (Parser*)h;
    int failures = 0;
    static thread_local FrameOut out;
    for (int b = 0; b < B; ++b) {
        int32_t* q = quant + (long)b * 2 * 1024;
        float* sc = scale + (long)b * 2 * 1024;
        int32_t* pm = perm + (long)b * 2 * 1024;
        int32_t* ft = filt + (long)b * 2 * 1024;
        float* lp = lpc + (long)b * 2 * MAX_FILTERS * MAX_ORDER;
        uint8_t* msk = ms + (long)b * 1024;
        float* inf = intf + (long)b * 1024;
        // Skip silent lanes BEFORE writing defaults: callers may issue
        // one parse call per sample-rate subgroup into the same output
        // arrays (mixed-rate lane groups), so untouched lanes must stay
        // untouched. Python's empty_frame_batch pre-fills the defaults.
        if (lens[b] < 0) continue;

        // defaults (also the failure state for unparseable lanes)
        memset(q, 0, 2 * 1024 * 4);
        memset(sc, 0, 2 * 1024 * 4);
        for (int c = 0; c < 2; ++c)
            for (int i = 0; i < 1024; ++i) pm[c * 1024 + i] = i;
        for (int i = 0; i < 2 * 1024; ++i) ft[i] = -1;
        memset(lp, 0, 2 * MAX_FILTERS * MAX_ORDER * 4);
        memset(msk, 0, 1024);
        memset(inf, 0, 1024 * 4);
        seq[b * 2] = seq[b * 2 + 1] = 0;
        shape[b * 2] = shape[b * 2 + 1] = 0;
        chan_valid[b * 2] = chan_valid[b * 2 + 1] = 0;
        if (!p->parse_au(au_data + offsets[b], lens[b], out)) {
            ++failures;
            continue;
        }
        for (int c = 0; c < out.n_channels && c < 2; ++c) {
            const LaneOut& l = out.ch[c];
            memcpy(q + c * 1024, l.quant, 1024 * 4);
            memcpy(sc + c * 1024, l.scale, 1024 * 4);
            memcpy(pm + c * 1024, l.perm, 1024 * 4);
            memcpy(ft + c * 1024, l.filt_id, 1024 * 4);
            memcpy(lp + c * MAX_FILTERS * MAX_ORDER, l.lpc, MAX_FILTERS * MAX_ORDER * 4);
            seq[b * 2 + c] = l.seq;
            shape[b * 2 + c] = l.shape;
            chan_valid[b * 2 + c] = 1;
        }
        memcpy(msk, out.ms_mask, 1024);
        memcpy(inf, out.int_factor, 1024 * 4);
    }
    return failures;
}

}  // extern "C"

extern "C" {

// Compact-wire batched parse: int16 quant, u8 line_sf, i8 intensity
// pos/sign, i16 tns regions.  Returns failures count; sets *overflow
// if any |quant| > 32767 occurred (caller should retry via the full
// int32 path for that batch).
int skt_aac_parse_batch_compact(void* h, const uint8_t* au_data,
                                const int64_t* offsets, const int64_t* lens, int B,
                                int16_t* quant, uint8_t* line_sf,
                                int8_t* int_pos, int8_t* int_sign,
                                uint8_t* ms, int16_t* regions, float* lpc,
                                int32_t* seq, int32_t* shape,
                                uint8_t* chan_valid, int32_t* overflow) {
    auto* p = (Parser*)h;
    int failures = 0;
    *overflow = 0;
    static thread_local FrameOut out;
    for (int b = 0; b < B; ++b) {
        int16_t* q = quant + (long)b * 2 * 1024;
        uint8_t* lsf = line_sf + (long)b * 2 * 1024;
        int8_t* ip = int_pos + (long)b * 1024;
        int8_t* isg = int_sign + (long)b * 1024;
        uint8_t* msk = ms + (long)b * 1024;
        int16_t* reg = regions + (long)b * 2 * MAX_FILTERS * 3;
        float* lp = lpc + (long)b * 2 * MAX_FILTERS * MAX_ORDER;
        // Skip silent lanes entirely (callers pre-zero the wire and may
        // compose one call per sample-rate subgroup into it — writing
        // defaults here would clobber other subgroups' lanes).
        if (lens[b] < 0) continue;
        // parse first (light mode: i16 quant, no scale/perm/filt
        // per-line arrays), then write every destination exactly once
        bool ok = p->parse_au(au_data + offsets[b], lens[b], out, /*full=*/false);
        if (!ok) ++failures;
        int nch = ok ? (out.n_channels < 2 ? out.n_channels : 2) : 0;
        for (int c = 0; c < 2; ++c) {
            if (c < nch) {
                const LaneOut& l = out.ch[c];
                *overflow |= l.overflow;
                memcpy(q + c * 1024, l.quant16, 1024 * 2);
                memcpy(lsf + c * 1024, out.line_sf[c], 1024);
                memcpy(reg + c * MAX_FILTERS * 3, out.regions[c], MAX_FILTERS * 3 * 2);
                memcpy(lp + c * MAX_FILTERS * MAX_ORDER, l.lpc, MAX_FILTERS * MAX_ORDER * 4);
                seq[b * 2 + c] = l.seq;
                shape[b * 2 + c] = l.shape;
                chan_valid[b * 2 + c] = 1;
            } else {
                memset(q + c * 1024, 0, 1024 * 2);
                memset(lsf + c * 1024, 0, 1024);
                memset(reg + c * MAX_FILTERS * 3, 0, MAX_FILTERS * 3 * 2);
                memset(lp + c * MAX_FILTERS * MAX_ORDER, 0, MAX_FILTERS * MAX_ORDER * 4);
                seq[b * 2 + c] = 0;
                shape[b * 2 + c] = 0;
                chan_valid[b * 2 + c] = 0;
            }
        }
        if (ok) {
            memcpy(ip, out.int_pos, 1024);
            memcpy(isg, out.int_sign, 1024);
            memcpy(msk, out.ms_mask, 1024);
        } else {
            memset(ip, 0, 1024);
            memset(isg, 0, 1024);
            memset(msk, 0, 1024);
        }
    }
    return failures;
}

}  // extern "C"
