// libavcodec encoder shim.
//
// Role-equivalent of the reference's encoder wrappers: FDK AacEncoder
// (soundkit-aac/src/lib.rs:20-100), libFLAC FlacEncoder
// (soundkit-flac/src/lib.rs:35), lame Mp3Encoder, libopus OpusEncoder
// (soundkit-opus).  Accepts interleaved f32, converts to the codec's
// native sample format, buffers to codec frame size, emits packets
// one at a time (the caller muxes: ADTS headers, packet tables, Ogg).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/channel_layout.h>
}

#include <cstring>
#include <deque>
#include <vector>

namespace {

struct AvEnc {
    AVCodecContext* ctx = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    std::vector<float> inbuf;  // interleaved f32 pending
    std::deque<std::vector<uint8_t>> packets;
    int64_t next_pts = 0;
    bool flushed = false;

    ~AvEnc() {
        if (ctx) avcodec_free_context(&ctx);
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
    }
};

void store_samples(AvEnc* e, const float* src, int n, int nch) {
    AVSampleFormat fmt = e->ctx->sample_fmt;
    const bool planar = av_sample_fmt_is_planar(fmt);
    for (int c = 0; c < nch; ++c) {
        uint8_t* base = planar ? e->frame->extended_data[c] : e->frame->extended_data[0];
        for (int i = 0; i < n; ++i) {
            float v = src[i * nch + c];
            int idx = planar ? i : i * nch + c;
            switch (av_get_packed_sample_fmt(fmt)) {
                case AV_SAMPLE_FMT_FLT: ((float*)base)[idx] = v; break;
                case AV_SAMPLE_FMT_DBL: ((double*)base)[idx] = v; break;
                case AV_SAMPLE_FMT_S16: {
                    // *32768 is the exact inverse of the f32
                    // canonicalization (s/32768) -> lossless paths
                    // (FLAC) stay bit-exact through the shim
                    float s = v * 32768.0f;
                    if (s > 32767.f) s = 32767.f;
                    if (s < -32768.f) s = -32768.f;
                    ((int16_t*)base)[idx] = (int16_t)lrintf(s);
                    break;
                }
                case AV_SAMPLE_FMT_S32: {
                    double s = (double)v * 2147483647.0;
                    if (s > 2147483647.0) s = 2147483647.0;
                    if (s < -2147483648.0) s = -2147483648.0;
                    ((int32_t*)base)[idx] = (int32_t)llrint(s);
                    break;
                }
                default: break;
            }
        }
    }
}

void drain_packets(AvEnc* e) {
    while (avcodec_receive_packet(e->ctx, e->pkt) == 0) {
        e->packets.emplace_back(e->pkt->data, e->pkt->data + e->pkt->size);
        av_packet_unref(e->pkt);
    }
}

int encode_frames(AvEnc* e, bool eof) {
    const int nch = e->ctx->ch_layout.nb_channels;
    const int fsize = e->ctx->frame_size > 0 ? e->ctx->frame_size : 1024;
    size_t have = e->inbuf.size() / nch;
    size_t pos = 0;
    while (have - pos >= (size_t)fsize) {
        e->frame->nb_samples = fsize;
        store_samples(e, e->inbuf.data() + pos * nch, fsize, nch);
        e->frame->pts = e->next_pts;
        e->next_pts += fsize;
        if (avcodec_send_frame(e->ctx, e->frame) < 0) return -1;
        drain_packets(e);
        pos += fsize;
    }
    e->inbuf.erase(e->inbuf.begin(), e->inbuf.begin() + pos * nch);
    if (eof) {
        size_t rem = e->inbuf.size() / nch;
        if (rem > 0) {
            // zero-pad the trailing partial frame
            e->inbuf.resize(fsize * nch, 0.0f);
            e->frame->nb_samples = fsize;
            store_samples(e, e->inbuf.data(), fsize, nch);
            e->frame->pts = e->next_pts;
            e->next_pts += fsize;
            avcodec_send_frame(e->ctx, e->frame);
            drain_packets(e);
            e->inbuf.clear();
        }
        avcodec_send_frame(e->ctx, nullptr);
        drain_packets(e);
        e->flushed = true;
    }
    return 0;
}

}  // namespace

extern "C" {

void* skt_av_enc_open(const char* codec_name, int sample_rate, int channels,
                      long bit_rate, int* frame_size_out) {
    av_log_set_level(AV_LOG_QUIET);
    const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return nullptr;
    auto* e = new AvEnc();
    e->ctx = avcodec_alloc_context3(codec);
    e->ctx->sample_rate = sample_rate;
    av_channel_layout_default(&e->ctx->ch_layout, channels);
    if (bit_rate > 0) e->ctx->bit_rate = bit_rate;
    // pick the first supported sample format
    if (codec->sample_fmts) e->ctx->sample_fmt = codec->sample_fmts[0];
    e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;  // extradata for adts/ogg
    e->ctx->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    if (avcodec_open2(e->ctx, codec, nullptr) < 0) { delete e; return nullptr; }
    e->pkt = av_packet_alloc();
    e->frame = av_frame_alloc();
    e->frame->format = e->ctx->sample_fmt;
    av_channel_layout_copy(&e->frame->ch_layout, &e->ctx->ch_layout);
    e->frame->nb_samples = e->ctx->frame_size > 0 ? e->ctx->frame_size : 1024;
    if (av_frame_get_buffer(e->frame, 0) < 0) { delete e; return nullptr; }
    *frame_size_out = e->ctx->frame_size > 0 ? e->ctx->frame_size : 1024;
    return e;
}

void skt_av_enc_close(void* h) { delete (AvEnc*)h; }

// interleaved f32; n_values = frames * channels; n_values==0 => flush
int skt_av_enc_push(void* h, const float* data, long n_values) {
    auto* e = (AvEnc*)h;
    if (e->flushed) return 0;
    if (n_values > 0) e->inbuf.insert(e->inbuf.end(), data, data + n_values);
    return encode_frames(e, n_values == 0);
}

// returns one packet's size (0 if none); dst may be null to query size
long skt_av_enc_pull(void* h, uint8_t* dst, long cap) {
    auto* e = (AvEnc*)h;
    if (e->packets.empty()) return 0;
    auto& p = e->packets.front();
    long n = (long)p.size();
    if (dst) {
        if (cap < n) return -n;  // caller buffer too small
        memcpy(dst, p.data(), n);
        e->packets.pop_front();
    }
    return n;
}

long skt_av_enc_extradata(void* h, uint8_t* dst, long cap) {
    auto* e = (AvEnc*)h;
    long n = e->ctx->extradata_size;
    if (dst && n > 0 && cap >= n) memcpy(dst, e->ctx->extradata, n);
    return n;
}

int skt_av_enc_frame_size(void* h) {
    auto* e = (AvEnc*)h;
    return e->ctx->frame_size > 0 ? e->ctx->frame_size : 1024;
}

}  // extern "C"
