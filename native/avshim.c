/* avshim.c — thin C shim over the system libavformat/libavcodec for the
 * universal decode rung (synthesizer_tpu/utils/libav.py).
 *
 * Why a shim instead of ctypes: libav's public API is struct-field-heavy
 * (AVFormatContext/AVCodecContext layouts change between major versions),
 * so poking offsets from Python is a version lottery.  Compiling this
 * file against the host's own dev headers at first use makes the binding
 * exactly as portable as the host's ffmpeg installation.
 *
 * API (all return 0 on success, negative on error with a message in
 * errbuf):
 *   avshim_decode(path, &frames, &nframes, &rate, &nch, errbuf, len)
 *       decode ANY libav-supported audio file to interleaved s16 at the
 *       stream's native rate; >2 channels downmix to stereo (swr).
 *       frames is malloc'd — free with avshim_free.
 *   avshim_probe(path, &nframes, &rate, &nch, codecbuf, codeclen,
 *                errbuf, len)
 *       header-only probe (no packets decoded beyond stream info).
 *   avshim_encode(path, frames, nframes, rate, nch, bitrate,
 *                 errbuf, len)
 *       encode s16 frames into the container/codec implied by the
 *       path's extension (.m4a/.mp4 -> AAC in MP4, .aac -> ADTS AAC,
 *       anything else avformat can guess).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>

/* the callers are library API, not a CLI: keep libav's info/warning
 * chatter (encoder Qavg lines, duration estimates) off stderr */
__attribute__((constructor)) static void avshim_quiet(void)
{
    av_log_set_level(AV_LOG_ERROR);
}

static void set_err(char *errbuf, int errbuf_len, const char *what, int averr)
{
    if (!errbuf || errbuf_len <= 0)
        return;
    if (averr < 0) {
        char avmsg[128];
        av_strerror(averr, avmsg, sizeof avmsg);
        snprintf(errbuf, (size_t)errbuf_len, "%s: %s", what, avmsg);
    } else {
        snprintf(errbuf, (size_t)errbuf_len, "%s", what);
    }
}

/* open path, find the best audio stream, open its decoder.
 * On success the fmt/ctx/stream outputs are live; caller must free. */
static int open_audio(const char *path, AVFormatContext **pfmt,
                      AVCodecContext **pctx, int *pstream,
                      const AVCodec **pcodec,
                      char *errbuf, int errbuf_len)
{
    AVFormatContext *fmt = NULL;
    int ret = avformat_open_input(&fmt, path, NULL, NULL);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "open failed", ret);
        return -1;
    }
    ret = avformat_find_stream_info(fmt, NULL);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "no stream info", ret);
        avformat_close_input(&fmt);
        return -1;
    }
    const AVCodec *codec = NULL;
    int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
    if (si < 0 || !codec) {
        set_err(errbuf, errbuf_len, "no decodable audio stream", si);
        avformat_close_input(&fmt);
        return -1;
    }
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) {
        set_err(errbuf, errbuf_len, "cannot alloc codec context", 0);
        avformat_close_input(&fmt);
        return -1;
    }
    ret = avcodec_parameters_to_context(ctx, fmt->streams[si]->codecpar);
    if (ret >= 0)
        ret = avcodec_open2(ctx, codec, NULL);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "cannot open decoder", ret);
        avcodec_free_context(&ctx);
        avformat_close_input(&fmt);
        return -1;
    }
    *pfmt = fmt;
    *pctx = ctx;
    *pstream = si;
    if (pcodec)
        *pcodec = codec;
    return 0;
}

void avshim_free(int16_t *p)
{
    free(p);
}

int avshim_probe(const char *path, long long *out_nframes, int *out_rate,
                 int *out_nch, char *codecbuf, int codecbuf_len,
                 char *errbuf, int errbuf_len)
{
    AVFormatContext *fmt = NULL;
    AVCodecContext *ctx = NULL;
    const AVCodec *codec = NULL;
    int si;
    if (open_audio(path, &fmt, &ctx, &si, &codec, errbuf, errbuf_len) < 0)
        return -1;
    AVStream *st = fmt->streams[si];
    int rate = ctx->sample_rate;
    int nch = ctx->ch_layout.nb_channels;
    long long nframes = 0;
    if (st->duration > 0)
        nframes = av_rescale_q(st->duration, st->time_base,
                               (AVRational){1, rate});
    else if (fmt->duration > 0)
        nframes = av_rescale(fmt->duration, rate, AV_TIME_BASE);
    if (codecbuf && codecbuf_len > 0)
        snprintf(codecbuf, (size_t)codecbuf_len, "%s", codec->name);
    *out_nframes = nframes;
    *out_rate = rate;
    *out_nch = nch > 2 ? 2 : nch;
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return 0;
}

struct growbuf {
    int16_t *data;
    long long nframes, cap; /* in frames */
    int nch;
};

static int grow_append(struct growbuf *g, const int16_t *frames,
                       long long nframes)
{
    if (g->nframes + nframes > g->cap) {
        long long cap = g->cap ? g->cap : 1 << 16;
        while (cap < g->nframes + nframes)
            cap *= 2;
        int16_t *p = realloc(g->data,
                             (size_t)cap * (size_t)g->nch * sizeof *p);
        if (!p)
            return -1;
        g->data = p;
        g->cap = cap;
    }
    memcpy(g->data + g->nframes * g->nch, frames,
           (size_t)nframes * (size_t)g->nch * sizeof *frames);
    g->nframes += nframes;
    return 0;
}

/* convert one decoded frame (or drain swr with frame==NULL) into g */
static int push_frame(SwrContext *swr, const AVFrame *frame,
                      struct growbuf *g, char *errbuf, int errbuf_len)
{
    int in_n = frame ? frame->nb_samples : 0;
    int out_cap = in_n + 8192;
    int16_t *tmp = malloc((size_t)out_cap * (size_t)g->nch * sizeof *tmp);
    if (!tmp) {
        set_err(errbuf, errbuf_len, "out of memory", 0);
        return -1;
    }
    for (;;) {
        uint8_t *outp = (uint8_t *)tmp;
        int n = swr_convert(swr, &outp, out_cap,
                            frame ? (const uint8_t **)frame->extended_data
                                  : NULL,
                            in_n);
        if (n < 0) {
            set_err(errbuf, errbuf_len, "swr_convert failed", n);
            free(tmp);
            return -1;
        }
        if (n > 0 && grow_append(g, tmp, n) < 0) {
            set_err(errbuf, errbuf_len, "out of memory", 0);
            free(tmp);
            return -1;
        }
        /* input is consumed on the first call; keep draining the
         * resampler's internal buffer until it runs dry */
        in_n = 0;
        frame = NULL;
        if (n < out_cap)
            break;
    }
    free(tmp);
    return 0;
}

int avshim_decode(const char *path, int16_t **out_frames,
                  long long *out_nframes, int *out_rate, int *out_nch,
                  char *errbuf, int errbuf_len)
{
    AVFormatContext *fmt = NULL;
    AVCodecContext *ctx = NULL;
    int si, ret;
    if (open_audio(path, &fmt, &ctx, &si, NULL, errbuf, errbuf_len) < 0)
        return -1;

    int rate = ctx->sample_rate;
    int nch = ctx->ch_layout.nb_channels > 2 ? 2
            : ctx->ch_layout.nb_channels;
    AVChannelLayout out_layout;
    if (nch == 1)
        out_layout = (AVChannelLayout)AV_CHANNEL_LAYOUT_MONO;
    else
        out_layout = (AVChannelLayout)AV_CHANNEL_LAYOUT_STEREO;
    AVChannelLayout in_layout = ctx->ch_layout;
    if (in_layout.order == AV_CHANNEL_ORDER_UNSPEC)
        av_channel_layout_default(&in_layout, in_layout.nb_channels);

    SwrContext *swr = NULL;
    ret = swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_S16, rate,
                              &in_layout, ctx->sample_fmt, rate, 0, NULL);
    if (ret >= 0)
        ret = swr_init(swr);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "cannot init resampler", ret);
        goto fail_codec;
    }

    struct growbuf g = {NULL, 0, 0, nch};
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    if (!pkt || !frame) {
        set_err(errbuf, errbuf_len, "out of memory", 0);
        goto fail_all;
    }

    int draining = 0;
    for (;;) {
        if (!draining) {
            ret = av_read_frame(fmt, pkt);
            if (ret == AVERROR_EOF) {
                draining = 1;
                ret = avcodec_send_packet(ctx, NULL);
            } else if (ret < 0) {
                set_err(errbuf, errbuf_len, "read error", ret);
                goto fail_all;
            } else if (pkt->stream_index != si) {
                av_packet_unref(pkt);
                continue;
            } else {
                ret = avcodec_send_packet(ctx, pkt);
                av_packet_unref(pkt);
            }
            /* a corrupt packet mid-file: skip it, keep decoding */
            if (ret < 0 && ret != AVERROR_EOF && !draining)
                continue;
        }
        for (;;) {
            ret = avcodec_receive_frame(ctx, frame);
            if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF)
                break;
            if (ret < 0) {
                set_err(errbuf, errbuf_len, "decode error", ret);
                goto fail_all;
            }
            if (push_frame(swr, frame, &g, errbuf, errbuf_len) < 0)
                goto fail_all;
            av_frame_unref(frame);
        }
        if (draining)
            break;
    }
    /* drain the resampler's tail */
    if (push_frame(swr, NULL, &g, errbuf, errbuf_len) < 0)
        goto fail_all;

    if (g.nframes == 0) {
        set_err(errbuf, errbuf_len, "stream decoded to zero frames", 0);
        goto fail_all;
    }
    av_frame_free(&frame);
    av_packet_free(&pkt);
    swr_free(&swr);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    *out_frames = g.data;
    *out_nframes = g.nframes;
    *out_rate = rate;
    *out_nch = nch;
    return 0;

fail_all:
    free(g.data);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    swr_free(&swr);
fail_codec:
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -1;
}

/* ------------------------------------------------------------------ */
/* encode                                                             */
/* ------------------------------------------------------------------ */

static int send_and_mux(AVFormatContext *ofmt, AVCodecContext *ctx,
                        AVStream *st, const AVFrame *frame, AVPacket *pkt,
                        char *errbuf, int errbuf_len)
{
    int ret = avcodec_send_frame(ctx, frame);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "encode error", ret);
        return -1;
    }
    for (;;) {
        ret = avcodec_receive_packet(ctx, pkt);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF)
            return 0;
        if (ret < 0) {
            set_err(errbuf, errbuf_len, "encode error", ret);
            return -1;
        }
        av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
        pkt->stream_index = st->index;
        ret = av_interleaved_write_frame(ofmt, pkt);
        if (ret < 0) {
            set_err(errbuf, errbuf_len, "write error", ret);
            return -1;
        }
    }
}

int avshim_encode(const char *path, const int16_t *frames,
                  long long nframes, int rate, int nch, int bitrate,
                  char *errbuf, int errbuf_len)
{
    AVFormatContext *ofmt = NULL;
    int ret = avformat_alloc_output_context2(&ofmt, NULL, NULL, path);
    if (ret < 0 || !ofmt) {
        set_err(errbuf, errbuf_len, "cannot guess container from name",
                ret);
        return -1;
    }
    enum AVCodecID cid = ofmt->oformat->audio_codec;
    const AVCodec *codec = avcodec_find_encoder(cid);
    if (!codec) {
        set_err(errbuf, errbuf_len, "no encoder for this container", 0);
        avformat_free_context(ofmt);
        return -1;
    }
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    AVStream *st = avformat_new_stream(ofmt, NULL);
    if (!ctx || !st) {
        set_err(errbuf, errbuf_len, "out of memory", 0);
        goto fail_ctx;
    }
    ctx->sample_rate = rate;
    av_channel_layout_default(&ctx->ch_layout, nch);
    ctx->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0]
                                         : AV_SAMPLE_FMT_S16;
    ctx->bit_rate = bitrate > 0 ? bitrate : 128000;
    ctx->time_base = (AVRational){1, rate};
    if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    ret = avcodec_open2(ctx, codec, NULL);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "cannot open encoder", ret);
        goto fail_ctx;
    }
    ret = avcodec_parameters_from_context(st->codecpar, ctx);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "cannot copy codec params", ret);
        goto fail_ctx;
    }
    st->time_base = ctx->time_base;

    if (!(ofmt->oformat->flags & AVFMT_NOFILE)) {
        ret = avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE);
        if (ret < 0) {
            set_err(errbuf, errbuf_len, "cannot open output file", ret);
            goto fail_ctx;
        }
    }
    ret = avformat_write_header(ofmt, NULL);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "cannot write header", ret);
        goto fail_io;
    }

    /* s16 interleaved -> the encoder's sample format */
    AVChannelLayout in_layout;
    av_channel_layout_default(&in_layout, nch);
    SwrContext *swr = NULL;
    ret = swr_alloc_set_opts2(&swr, &ctx->ch_layout, ctx->sample_fmt,
                              rate, &in_layout, AV_SAMPLE_FMT_S16, rate,
                              0, NULL);
    if (ret >= 0)
        ret = swr_init(swr);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "cannot init converter", ret);
        goto fail_io;
    }

    int block = ctx->frame_size > 0 ? ctx->frame_size : 1024;
    AVFrame *frame = av_frame_alloc();
    AVPacket *pkt = av_packet_alloc();
    if (!frame || !pkt) {
        set_err(errbuf, errbuf_len, "out of memory", 0);
        goto fail_swr;
    }
    long long pos = 0, pts = 0;
    while (pos < nframes) {
        int n = (int)(nframes - pos < block ? nframes - pos : block);
        frame->nb_samples = n;
        frame->format = ctx->sample_fmt;
        ret = av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
        if (ret >= 0)
            ret = av_frame_get_buffer(frame, 0);
        if (ret < 0) {
            set_err(errbuf, errbuf_len, "cannot alloc frame", ret);
            goto fail_swr;
        }
        const uint8_t *inp = (const uint8_t *)(frames + pos * nch);
        ret = swr_convert(swr, frame->extended_data, n, &inp, n);
        if (ret < 0) {
            set_err(errbuf, errbuf_len, "convert failed", ret);
            goto fail_swr;
        }
        frame->pts = pts;
        pts += n;
        if (send_and_mux(ofmt, ctx, st, frame, pkt,
                         errbuf, errbuf_len) < 0)
            goto fail_swr;
        av_frame_unref(frame);
        pos += n;
    }
    if (send_and_mux(ofmt, ctx, st, NULL, pkt, errbuf, errbuf_len) < 0)
        goto fail_swr;
    ret = av_write_trailer(ofmt);
    if (ret < 0) {
        set_err(errbuf, errbuf_len, "cannot write trailer", ret);
        goto fail_swr;
    }
    av_frame_free(&frame);
    av_packet_free(&pkt);
    swr_free(&swr);
    if (!(ofmt->oformat->flags & AVFMT_NOFILE))
        avio_closep(&ofmt->pb);
    avcodec_free_context(&ctx);
    avformat_free_context(ofmt);
    return 0;

fail_swr:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    swr_free(&swr);
fail_io:
    if (!(ofmt->oformat->flags & AVFMT_NOFILE))
        avio_closep(&ofmt->pb);
fail_ctx:
    avcodec_free_context(&ctx);
    avformat_free_context(ofmt);
    return -1;
}
