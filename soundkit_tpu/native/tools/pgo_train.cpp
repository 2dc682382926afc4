// PGO training harness for the host parsers.
//
// Compiled with -fprofile-generate by the Makefile's two-stage build,
// run once over the reference ADTS fixture, then the shared library is
// rebuilt with -fprofile-use.  Profile-guided layout is worth ~25-35%
// on the branchy VLC decode (measured on the v3 batch parse), which is
// the serving path's host bottleneck.
//
// Usage: pgo_train <fixture.aac> [testdata_dir]
//
// When the testdata directory is given, the FLAC/MP3/GSM/ALAC parsers
// and the FLAC frame packer train too (each on its own fixture or on
// synthetic plans); celt/vorbis need Python-pushed spec tables and are
// instead covered by -fprofile-partial-training in the Makefile.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* skt_aac_new(int sr_index);
void skt_aac_free(void* h);
int skt_aac_parse_batch_v3_ptrs(void* h, const uint8_t* const* aus,
    const int64_t* lens, int B, int nthreads,
    uint16_t* esc_idx, int16_t* esc_val, int16_t* regions, int8_t* quant,
    uint8_t* sf_len, uint8_t* sf_val, uint8_t* msis_len, uint8_t* msis_ms,
    int8_t* msis_pos, int8_t* msis_sign, int8_t* refl, uint8_t* crb,
    uint8_t* order, uint8_t* seq, uint8_t* shape, uint8_t* chan_valid,
    int32_t* overflow);
int skt_aac_parse_batch_compact_ptrs(void* h, const uint8_t* const* aus,
    const int64_t* lens, int B, int nthreads,
    int16_t* quant, uint8_t* line_sf, int8_t* int_pos, int8_t* int_sign,
    uint8_t* ms, int16_t* regions, float* lpc, int32_t* seq, int32_t* shape,
    uint8_t* chan_valid, int32_t* overflow);
int skt_aac_parse_batch_v4_ptrs(void* h, const uint8_t* const* aus,
    const int64_t* lens, int B, int nthreads,
    int16_t* regions, uint8_t* sf_len, uint8_t* sf_val, uint8_t* msis_len,
    uint8_t* msis_ms, int8_t* msis_pos, int8_t* msis_sign, int8_t* refl,
    uint8_t* crb, uint8_t* order, uint32_t* runs, uint8_t* n_runs,
    uint16_t* spec_bit, uint8_t* pns, uint8_t* seq, uint8_t* shape,
    uint8_t* chan_valid, uint8_t* au_out, int32_t* max_cw,
    int32_t* overflow);
}

extern "C" {
void* skt_flac_new();
void skt_flac_free(void* h);
int skt_flac_push(void* h, const uint8_t* data, long len);
long skt_flac_pull(void* h, int32_t* out, long cap);
long skt_flac_pack_frames(long F, long N, int channels, int sample_rate,
                          int bits, int precision, const int64_t* frame_no,
                          const int32_t* assign, const int32_t* kind,
                          const int32_t* order, const int32_t* shift,
                          const int32_t* qlp, int qstride,
                          const int32_t* res, const int32_t* block,
                          uint8_t* out, long cap, int64_t* out_len);
void* skt_mp3_new();
void skt_mp3_free(void* h);
long skt_mp3_push(void* h, const uint8_t* data, long len);
int skt_mp3_pop(void* h, int16_t* q, int16_t* e, int32_t* meta);
void* skt_gsm_new(int variant);
void skt_gsm_free(void* h);
long skt_gsm_decode(void* h, const uint8_t* data, long len, int16_t* out);
void* skt_alac_new(const uint8_t* cookie, long len);
void skt_alac_free(void* h);
long skt_alac_frame_length(void* h);
int skt_alac_channels(void* h);
long skt_alac_decode(void* h, const uint8_t* pkt, long len, int32_t* out);
}

static std::vector<uint8_t> slurp(const std::string& path) {
    FILE* f = fopen(path.c_str(), "rb");
    if (!f) return {};
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> data((size_t)sz);
    if (fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) data.clear();
    fclose(f);
    return data;
}

static const char* CLIP = "A_Tusk_is_used_to_make_costly_gifts";

static void train_flac(const std::string& dir) {
    auto data = slurp(dir + "/flac/" + CLIP + ".flac");
    if (data.empty()) return;
    std::vector<int32_t> pcm(1 << 16);
    for (int r = 0; r < 6; r++) {
        void* h = skt_flac_new();
        skt_flac_push(h, data.data(), (long)data.size());
        while (skt_flac_pull(h, pcm.data(), (long)pcm.size()) > 0) {}
        skt_flac_free(h);
    }
}

static void train_flac_pack(const std::string&) {
    // synthetic plans over deterministic tonal+noise PCM: exercises
    // the Rice parameter search, partition scoring, and bit packing
    const long F = 24, N = 4096;
    std::vector<int32_t> block(F * 2 * N);
    uint32_t s = 12345;
    for (long i = 0; i < F * 2 * N; i++) {
        s = s * 1664525u + 1013904223u;
        double t = (double)(i % N);
        block[i] = (int32_t)(9000.0 * std::sin(0.013 * t) +
                             (int32_t)(s >> 20) - 2048);
    }
    std::vector<int64_t> fno(F);
    std::vector<int32_t> assign(F), kind(F * 2), order(F * 2), shift(F * 2);
    std::vector<int32_t> qlp(F * 2 * 8);
    for (long f = 0; f < F; f++) {
        fno[f] = f;
        static const int32_t assigns[4] = {1, 8, 9, 10};
        assign[f] = assigns[f % 4];  // all four stereo packings
        for (int sl = 0; sl < 2; sl++) {
            kind[f * 2 + sl] = (int32_t)(f % 2);  // fixed / lpc
            order[f * 2 + sl] = kind[f * 2 + sl] ? 8 : (int32_t)(f % 5);
            shift[f * 2 + sl] = 12;
            for (int j = 0; j < 8; j++)
                qlp[(f * 2 + sl) * 8 + j] = (int32_t)(((f + j) % 7) - 3) * 800;
        }
    }
    long cap = 256 + N * 12;
    std::vector<uint8_t> out((size_t)F * cap);
    std::vector<int64_t> out_len(F);
    for (int r = 0; r < 8; r++)
        skt_flac_pack_frames(F, N, 2, 44100, 16, 14, fno.data(),
                             assign.data(), kind.data(), order.data(),
                             shift.data(), qlp.data(), 8, nullptr,
                             block.data(), out.data(), cap, out_len.data());
}

static void train_mp3(const std::string& dir) {
    auto data = slurp(dir + "/mp3/" + CLIP + ".mp3");
    if (data.empty()) return;
    std::vector<int16_t> q(2 * 576), e(2 * 576);
    std::vector<int32_t> meta(10);
    for (int r = 0; r < 6; r++) {
        void* h = skt_mp3_new();
        skt_mp3_push(h, data.data(), (long)data.size());
        while (skt_mp3_pop(h, q.data(), e.data(), meta.data())) {}
        skt_mp3_free(h);
    }
}

static void train_gsm(const std::string& dir) {
    auto data = slurp(dir + "/gsm/" + CLIP + ".gsm");
    if (data.empty()) return;
    std::vector<int16_t> out(((long)data.size() / 33 + 2) * 320 + 320);
    for (int r = 0; r < 10; r++) {
        void* h = skt_gsm_new(0);
        skt_gsm_decode(h, data.data(), (long)data.size(), out.data());
        skt_gsm_free(h);
    }
}

static void train_alac(const std::string& dir) {
    auto data = slurp(dir + "/alac/" + CLIP + ".m4a");
    if (data.empty()) return;
    // magic cookie for the fixture (matches fuzz_parsers.py)
    static const uint8_t cookie[] = {
        0x00,0x00,0x00,0x24,0x61,0x6c,0x61,0x63,0x00,0x00,0x00,0x00,
        0x00,0x00,0x10,0x00,0x00,0x10,0x28,0x0a,0x0e,0x01,0x00,0x00,
        0x00,0x00,0x20,0x04,0x00,0x01,0xf4,0x00,0x00,0x00,0x1f,0x40};
    void* h = skt_alac_new(cookie, sizeof(cookie));
    if (!h) return;
    long fl = skt_alac_frame_length(h);
    int ch = skt_alac_channels(h);
    std::vector<int32_t> out((size_t)(fl > 0 ? fl : 4096) *
                             (ch > 0 ? ch : 2));
    // mdat walk is in the Python layer; feed coarse slices so the
    // packet decode hot paths still execute
    for (long p = 0; p + 4096 <= (long)data.size(); p += 4096)
        skt_alac_decode(h, data.data() + p, 4096, out.data());
    skt_alac_free(h);
}

int main(int argc, char** argv) {
    if (argc < 2) return 0;
    if (argc >= 3) {
        std::string dir(argv[2]);
        train_flac(dir);
        train_flac_pack(dir);
        train_mp3(dir);
        train_gsm(dir);
        train_alac(dir);
    }
    FILE* f = fopen(argv[1], "rb");
    if (!f) return 0;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> data((size_t)sz);
    if (fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) { fclose(f); return 0; }
    fclose(f);

    // walk ADTS frames
    std::vector<const uint8_t*> au_ptr;
    std::vector<int64_t> au_len;
    long p = 0;
    while (p + 7 <= sz) {
        if (data[p] != 0xFF || (data[p + 1] & 0xF0) != 0xF0) { ++p; continue; }
        long flen = ((data[p + 3] & 3) << 11) | (data[p + 4] << 3) | (data[p + 5] >> 5);
        if (flen < 7 || p + flen > sz) break;
        int hdr = (data[p + 1] & 1) ? 7 : 9;
        au_ptr.push_back(data.data() + p + hdr);
        au_len.push_back(flen - hdr);
        p += flen;
    }
    if (au_ptr.empty()) return 0;
    int sr_index = (data[2] >> 2) & 0xF;
    int n = (int)au_ptr.size();

    const int B = 512;
    std::vector<const uint8_t*> ptrs(B);
    std::vector<int64_t> lens(B);
    std::vector<uint16_t> esc_idx(B * 32);
    std::vector<int16_t> esc_val(B * 32), regions(B * 2 * 8 * 3);
    std::vector<int8_t> quant(B * 2 * 1024);
    std::vector<uint8_t> sf_len(B * 2 * 128), sf_val(B * 2 * 128);
    std::vector<uint8_t> msis_len(B * 128), msis_ms(B * 128);
    std::vector<int8_t> msis_pos(B * 128), msis_sign(B * 128);
    std::vector<int8_t> refl(B * 2 * 8 * 20);
    std::vector<uint8_t> crb(B * 2 * 8), ord(B * 2 * 8);
    std::vector<uint8_t> seq(B * 2), shp(B * 2), cv(B * 2);
    std::vector<int16_t> quant16(B * 2 * 1024);
    std::vector<uint8_t> line_sf(B * 2 * 1024), ms(B * 1024);
    std::vector<int8_t> int_pos(B * 1024), int_sign(B * 1024);
    std::vector<float> lpc(B * 2 * 8 * 20);
    std::vector<int32_t> seq32(B * 2), shp32(B * 2);
    std::vector<uint32_t> runs(B * 2 * 128);
    std::vector<uint8_t> n_runs(B * 2), au_out((size_t)B * 1024);
    std::vector<uint16_t> spec_bit(B * 2);
    std::vector<uint8_t> pns((size_t)B * 2 * 4 * 128);  // generous
    int32_t ovf, max_cw;

    void* h = skt_aac_new(sr_index);
    for (int t = 0; t < 20; ++t) {
        for (int i = 0; i < B; ++i) {
            ptrs[i] = au_ptr[(t + i) % n];
            lens[i] = au_len[(t + i) % n];
        }
        skt_aac_parse_batch_v3_ptrs(h, ptrs.data(), lens.data(), B, 1,
            esc_idx.data(), esc_val.data(), regions.data(), quant.data(),
            sf_len.data(), sf_val.data(), msis_len.data(), msis_ms.data(),
            msis_pos.data(), msis_sign.data(), refl.data(), crb.data(),
            ord.data(), seq.data(), shp.data(), cv.data(), &ovf);
        skt_aac_parse_batch_v4_ptrs(h, ptrs.data(), lens.data(), B, 1,
            regions.data(), sf_len.data(), sf_val.data(), msis_len.data(),
            msis_ms.data(), msis_pos.data(), msis_sign.data(), refl.data(),
            crb.data(), ord.data(), runs.data(), n_runs.data(),
            spec_bit.data(), pns.data(), seq.data(), shp.data(), cv.data(),
            au_out.data(), &max_cw, &ovf);
        if (t < 4)  // keep the fallback path warm in the profile too
            skt_aac_parse_batch_compact_ptrs(h, ptrs.data(), lens.data(), B, 1,
                quant16.data(), line_sf.data(), int_pos.data(), int_sign.data(),
                ms.data(), regions.data(), lpc.data(), seq32.data(),
                shp32.data(), cv.data(), &ovf);
    }
    skt_aac_free(h);
    return 0;
}
