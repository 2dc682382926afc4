// PGO training harness for the host parsers.
//
// Compiled with -fprofile-generate by the Makefile's two-stage build,
// run once over the reference ADTS fixture, then the shared library is
// rebuilt with -fprofile-use.  Profile-guided layout is worth ~25-35%
// on the branchy VLC decode (measured on the v3 batch parse), which is
// the serving path's host bottleneck.
//
// Usage: pgo_train <fixture.aac>

#include <cstdint>
#include <cstdio>
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
    uint16_t* spec_bit, uint8_t* seq, uint8_t* shape, uint8_t* chan_valid,
    uint8_t* au_out, int32_t* max_cw, int32_t* overflow);
}

int main(int argc, char** argv) {
    if (argc < 2) return 0;
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
            spec_bit.data(), seq.data(), shp.data(), cv.data(),
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
