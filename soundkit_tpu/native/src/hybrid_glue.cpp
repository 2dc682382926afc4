// Fused hybrid-Opus rounds walk (r4 VERDICT next #4).
//
// A hybrid packet codes SILK-WB then CELT (start band 17) on ONE
// shared range coder.  The round-4 serving path paid two ctypes
// round-trips plus fresh Python-side marshalling per (round) — this
// glue walks R rounds x B lanes in ONE call, chaining the existing
// exports: skt_silk_parse_many (silk_parse.cpp) exports the synthesis
// inputs and the final coder state per lane, and
// skt_celt_parse_many_cont (celt_parse.cpp) continues the same bytes
// from that state.  Outputs land in caller-provided [R, B, ...]
// planes ready for the chunked device dispatch.
//
// Reference role: soundkit-opus/src/lib.rs:295-430 per-pipeline
// hybrid decode (the repo owns the math; layout documented at the
// two chained exports).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

int skt_silk_parse_many(void** handles, int B, const uint8_t* buf,
                        const long* offs, const long* lens,
                        const int* bws, const int* coded,
                        const int* dur_ms, const unsigned char* valid,
                        double* exc, double* gains, double* coef,
                        double* ltp, double* ltpscale, double* stereo_w,
                        int* lags, int* flags, long* n_out, long* info);

int skt_celt_parse_many_cont(void** handles, int B, const uint8_t* buf,
                             const long* offs, const long* lens,
                             const int* starts, const int* ends,
                             const int* coded,
                             const unsigned char* valid,
                             const long* rc_init, int frame_size,
                             int Cmax, double* freq, double* comb,
                             int* sflag, int* ok, int* red);

// One call per chunk of R rounds.  Layouts (all row-major):
//   base  [B] i64   current byte offset of each lane's next packet in
//                   buf (per-lane packets are contiguous)
//   plens [B*R] i32 packet byte length per (lane, round); 0 = no
//                   packet this round (lane invalid, state frozen)
//   ends/coded [B*R] i32 per (lane, round)
//   silk outputs: exc [R*B*2*320] gains [R*B*2*4] coef [R*B*2*2*16]
//     ltp [R*B*2*4*5] ltpscale [R*B*2] stereo_w [R*B*4] f64,
//     lags [R*B*2*4] flags [R*B*12] i32, n_out [R*B] i64
//   celt outputs: freq [R*B*Cmax*frame_size] comb [R*B*16] f64,
//     sflag/ok/red [R*B] i32
// Returns 0 (per-lane failures surface via n_out / ok planes).
int skt_hybrid_parse_rounds(void** silk_h, void** celt_h, int B, int R,
                            const uint8_t* buf, const long* base,
                            const int* plens, const int* ends,
                            const int* coded, int frame_size, int Cmax,
                            double* exc, double* gains, double* coef,
                            double* ltp, double* ltpscale,
                            double* stereo_w, int* lags, int* flags,
                            long* n_out, double* freq, double* comb,
                            int* sflag, int* ok, int* red) {
  std::vector<long> cur(base, base + B);
  std::vector<long> offs(B), lens(B);
  std::vector<int> bws(B, 2), dur(B, 20), starts(B, 17);
  std::vector<int> coded_r(B), ends_r(B);
  std::vector<unsigned char> valid(B);
  std::vector<long> info((size_t)B * 13), rc((size_t)B * 9);
  for (int r = 0; r < R; r++) {
    int any = 0;
    for (int b = 0; b < B; b++) {
      long len = plens[(size_t)b * R + r];
      offs[b] = cur[b];
      lens[b] = len;
      valid[b] = len > 0;
      coded_r[b] = coded[(size_t)b * R + r];
      ends_r[b] = ends[(size_t)b * R + r];
      if (len > 0) {
        cur[b] += len;
        any = 1;
      }
    }
    if (!any) continue;
    size_t rb = (size_t)r * B;
    skt_silk_parse_many(silk_h, B, buf, offs.data(), lens.data(),
                        bws.data(), coded_r.data(), dur.data(),
                        valid.data(), exc + rb * 2 * 320,
                        gains + rb * 2 * 4, coef + rb * 2 * 2 * 16,
                        ltp + rb * 2 * 4 * 5, ltpscale + rb * 2,
                        stereo_w + rb * 4, lags + rb * 2 * 4,
                        flags + rb * 12, n_out + rb,
                        info.data());
    for (int b = 0; b < B; b++)
      memcpy(rc.data() + (size_t)b * 9, info.data() + (size_t)b * 13 + 4,
             9 * sizeof(long));
    skt_celt_parse_many_cont(celt_h, B, buf, offs.data(), lens.data(),
                             starts.data(), ends_r.data(), coded_r.data(),
                             valid.data(), rc.data(), frame_size, Cmax,
                             freq + rb * (size_t)Cmax * frame_size,
                             comb + rb * 16, sflag + rb, ok + rb,
                             red + rb);
  }
  return 0;
}

}  // extern "C"
