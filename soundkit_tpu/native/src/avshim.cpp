// libavcodec host-decode shim.
//
// Role-equivalent of the reference's C-library codec wrappers: the
// reference links FDK-AAC (soundkit-aac), libgsm (soundkit-gsm),
// OpenCORE AMR (soundkit-amr), g729-sys (soundkit-g729) and friends;
// this framework links the system libavcodec for the same host decode
// duties.  Formats the reference implements in pure Rust itself
// (G.711/722/726, FLAC, WAV, AAC-LC syntax) have from-scratch
// implementations elsewhere in this repo; libavcodec additionally
// serves as the conformance oracle (the reference uses FDK + ffmpeg
// CLI the same way, aac-wasm-bench + bench_ffmpeg.sh).
//
// C ABI: open/push/pull/close with optional AVCodecParser framing for
// self-framing byte streams (MP3, ADTS AAC, AC3).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/channel_layout.h>
}

#include <cstring>
#include <deque>
#include <string>
#include <vector>

namespace {

struct AvDec {
    const AVCodec* codec = nullptr;
    AVCodecContext* ctx = nullptr;
    AVCodecParserContext* parser = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    std::vector<uint8_t> inbuf;   // parser accumulation
    std::deque<float> out;        // interleaved f32 canonical
    int out_rate = 0;
    int out_channels = 0;
    bool flushed = false;
    char error[256] = {0};

    ~AvDec() {
        if (parser) av_parser_close(parser);
        if (ctx) avcodec_free_context(&ctx);
        if (pkt) av_packet_free(&pkt);
        if (frame) av_frame_free(&frame);
    }
};

float sample_to_f32(const AVFrame* f, int ch, int i, AVSampleFormat fmt) {
    const bool planar = av_sample_fmt_is_planar(fmt);
    const int nch = f->ch_layout.nb_channels;
    const uint8_t* base = planar ? f->extended_data[ch] : f->extended_data[0];
    const int idx = planar ? i : i * nch + ch;
    switch (av_get_packed_sample_fmt(fmt)) {
        case AV_SAMPLE_FMT_FLT: return ((const float*)base)[idx];
        case AV_SAMPLE_FMT_DBL: return (float)((const double*)base)[idx];
        case AV_SAMPLE_FMT_S16: return ((const int16_t*)base)[idx] / 32768.0f;
        case AV_SAMPLE_FMT_S32: return ((const int32_t*)base)[idx] / 2147483648.0f;
        case AV_SAMPLE_FMT_U8:  return (((const uint8_t*)base)[idx] - 128) / 128.0f;
        default: return 0.0f;
    }
}

void drain_frames(AvDec* d) {
    while (avcodec_receive_frame(d->ctx, d->frame) == 0) {
        const int nch = d->frame->ch_layout.nb_channels;
        const int n = d->frame->nb_samples;
        d->out_rate = d->frame->sample_rate ? d->frame->sample_rate : d->ctx->sample_rate;
        d->out_channels = nch;
        AVSampleFormat fmt = (AVSampleFormat)d->frame->format;
        for (int i = 0; i < n; ++i)
            for (int c = 0; c < nch; ++c)
                d->out.push_back(sample_to_f32(d->frame, c, i, fmt));
        av_frame_unref(d->frame);
    }
}

int send_packet(AvDec* d, const uint8_t* data, int size) {
    d->pkt->data = const_cast<uint8_t*>(data);
    d->pkt->size = size;
    int rc = avcodec_send_packet(d->ctx, size ? d->pkt : nullptr);
    if (rc < 0 && rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
        // decode errors on a packet are non-fatal for streaming decode:
        // skip the packet (mirrors the reference's tolerate-and-continue)
        return 0;
    }
    drain_frames(d);
    return 0;
}

}  // namespace

extern "C" {

void* skt_av_open(const char* codec_name, int sample_rate, int channels,
                  const uint8_t* extradata, int extradata_len, int use_parser) {
    av_log_set_level(AV_LOG_QUIET);  // errors flow as data; resync chatter is expected
    auto* d = new AvDec();
    d->codec = avcodec_find_decoder_by_name(codec_name);
    if (!d->codec) { delete d; return nullptr; }
    d->ctx = avcodec_alloc_context3(d->codec);
    if (sample_rate) d->ctx->sample_rate = sample_rate;
    if (channels) {
        av_channel_layout_default(&d->ctx->ch_layout, channels);
    }
    if (extradata && extradata_len > 0) {
        d->ctx->extradata = (uint8_t*)av_mallocz(extradata_len + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(d->ctx->extradata, extradata, extradata_len);
        d->ctx->extradata_size = extradata_len;
    }
    if (avcodec_open2(d->ctx, d->codec, nullptr) < 0) { delete d; return nullptr; }
    if (use_parser) {
        d->parser = av_parser_init(d->codec->id);
        if (!d->parser) { delete d; return nullptr; }
    }
    d->pkt = av_packet_alloc();
    d->frame = av_frame_alloc();
    return d;
}

void skt_av_close(void* h) { delete (AvDec*)h; }

// len == 0 => EOF/flush
int skt_av_push(void* h, const uint8_t* data, long len) {
    auto* d = (AvDec*)h;
    if (d->flushed) return 0;
    if (!d->parser) {
        if (len == 0) {
            d->flushed = true;
            return send_packet(d, nullptr, 0);
        }
        return send_packet(d, data, (int)len);
    }
    // parser-based framing
    if (len > 0) d->inbuf.insert(d->inbuf.end(), data, data + len);
    const bool eof = (len == 0);
    size_t pos = 0;
    for (;;) {
        uint8_t* out_data = nullptr;
        int out_size = 0;
        int remaining = (int)(d->inbuf.size() - pos);
        if (remaining == 0 && !eof) break;
        int used = av_parser_parse2(d->parser, d->ctx, &out_data, &out_size,
                                    d->inbuf.data() + pos, remaining,
                                    AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
        if (used < 0) { pos += 1; continue; }  // resync on bad byte
        pos += used;
        if (out_size > 0) send_packet(d, out_data, out_size);
        else if (eof && remaining == 0) break;
        else if (used == 0 && out_size == 0) break;
    }
    d->inbuf.erase(d->inbuf.begin(), d->inbuf.begin() + pos);
    if (eof) {
        d->flushed = true;
        send_packet(d, nullptr, 0);
    }
    return 0;
}

long skt_av_pull_f32(void* h, float* dst, long max_values, int* rate, int* channels) {
    auto* d = (AvDec*)h;
    long n = (long)d->out.size() < max_values ? (long)d->out.size() : max_values;
    // keep whole frames' interleaving consistent: n is fine (caller drains fully)
    for (long i = 0; i < n; ++i) { dst[i] = d->out.front(); d->out.pop_front(); }
    *rate = d->out_rate;
    *channels = d->out_channels;
    return n;
}

const char* skt_av_err(void* h) { return ((AvDec*)h)->error; }

}  // extern "C"
