// libvidil_decode — native random-access video decoding for vidil_tpu.
//
// TPU-native replacement for the reference's decord C++ VideoReader
// (SURVEY §2b: decord get_batch(indices) with optional decode-time resize).
// FFmpeg demux/decode + swscale bicubic resize to RGB24, exposed through a
// minimal C ABI consumed via ctypes (no pybind11 in this environment).
//
// Semantics match the python cv2 fallback (vidil_tpu/data/video_reader.py):
// exact frame indexing with sequential skip between nearby sorted indices;
// keyframe seeks on backward jumps AND forward gaps >= FWD_SEEK_GAP (with a
// per-file bailout when keyframes prove too sparse or seeks unreliable).
//
// Build: tools/build_native.sh

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream_index = -1;
  int64_t n_frames = 0;
  double fps = 0.0;
  int64_t next_index = 0;  // index of the next frame receive_frame yields
  bool no_fwd_seek = false;  // set when keyframes proved too sparse to help
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  std::string error;
};

int count_frames_by_scan(Reader* r) {
  // some containers do not carry nb_frames; count packets of the stream
  int64_t n = 0;
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(r->fmt, pkt) >= 0) {
    if (pkt->stream_index == r->stream_index) n++;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  av_seek_frame(r->fmt, r->stream_index, 0, AVSEEK_FLAG_BACKWARD);
  avcodec_flush_buffers(r->dec);
  return static_cast<int>(n);
}

// decode the next frame of the video stream into r->frame; <0 on EOF/error
int decode_next(Reader* r) {
  while (true) {
    int ret = avcodec_receive_frame(r->dec, r->frame);
    if (ret == 0) return 0;
    if (ret != AVERROR(EAGAIN) && ret != AVERROR_EOF) return ret;
    if (ret == AVERROR_EOF) return ret;
    // need more packets
    while (true) {
      ret = av_read_frame(r->fmt, r->pkt);
      if (ret < 0) {
        // flush
        avcodec_send_packet(r->dec, nullptr);
        break;
      }
      if (r->pkt->stream_index == r->stream_index) {
        avcodec_send_packet(r->dec, r->pkt);
        av_packet_unref(r->pkt);
        break;
      }
      av_packet_unref(r->pkt);
    }
  }
}

// position the decoder so the next decoded frame has index `target`.
//
// Backward jumps always seek. Forward jumps >= FWD_SEEK_GAP frames also
// seek (to the keyframe preceding `target`) instead of decoding every
// intermediate frame — sparse frame sampling (4 of ~120, the pipeline's
// num_frm pattern) otherwise pays a full-video decode per video
// (measured 7.5 videos/s on the 1-core host, benchmarks/decode_bench).
// If the landed keyframe turns out to be BEHIND where we already were
// (pathologically sparse keyframes), the roll-forward from the keyframe
// stays correct and `no_fwd_seek` disables further forward seeks for
// this file.
constexpr int64_t FWD_SEEK_GAP = 16;

int seek_to(Reader* r, int64_t target) {
  bool fwd = target >= r->next_index + FWD_SEEK_GAP && !r->no_fwd_seek;
  int64_t prev = r->next_index;
  if (target < r->next_index || fwd) {
    AVStream* st = r->fmt->streams[r->stream_index];
    // frame index <-> stream timestamp honors the stream's start offset:
    // mp4 edit lists put frame 0 at a nonzero pts, and ignoring it both
    // mis-targets the seek and mislabels the landed index
    int64_t start_ts = st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
    double sec = r->fps > 0 ? target / r->fps : 0.0;
    int64_t ts = start_ts + static_cast<int64_t>(sec / av_q2d(st->time_base));
    if (av_seek_frame(r->fmt, r->stream_index, ts, AVSEEK_FLAG_BACKWARD) < 0) {
      if (fwd) {
        // unseekable input: stop trying forward seeks for this file and
        // roll forward from the position we still hold (demuxer unmoved)
        r->no_fwd_seek = true;
      } else {
        if (av_seek_frame(r->fmt, r->stream_index, start_ts,
                          AVSEEK_FLAG_BACKWARD) < 0) return -1;
        avcodec_flush_buffers(r->dec);
        r->next_index = 0;
      }
    } else {
      avcodec_flush_buffers(r->dec);
      // decode one frame to learn where we landed (keyframe <= target)
      if (decode_next(r) < 0) return -1;
      AVStream* s2 = r->fmt->streams[r->stream_index];
      int64_t pts = r->frame->best_effort_timestamp;
      if (pts == AV_NOPTS_VALUE && r->fps > 0 && target > 0) {
        // unknown landing position: counting from here would silently
        // mislabel every subsequent frame. Rebuild deterministic state
        // from the start and stop forward-seeking this file.
        r->no_fwd_seek = true;
        if (av_seek_frame(r->fmt, r->stream_index, start_ts,
                          AVSEEK_FLAG_BACKWARD) < 0) return -1;
        avcodec_flush_buffers(r->dec);
        r->next_index = 0;
        while (r->next_index <= target) {
          if (decode_next(r) < 0) return -1;
          r->next_index++;
        }
        return 1;
      }
      int64_t landed = 0;
      if (pts != AV_NOPTS_VALUE && r->fps > 0)
        landed = static_cast<int64_t>((pts - start_ts) * av_q2d(s2->time_base)
                                      * r->fps + 0.5);
      if (landed < 0) landed = 0;
      r->next_index = landed + 1;
      if (fwd && landed + FWD_SEEK_GAP < prev)  // keyframes too sparse:
        r->no_fwd_seek = true;                  // lost ground, stop trying
      if (landed == target) return 1;  // frame already in r->frame
      if (landed > target) {           // overshot (timestamp rounding):
        if (fwd) r->no_fwd_seek = true;  // don't re-overshoot per index
        if (av_seek_frame(r->fmt, r->stream_index, start_ts,
                          AVSEEK_FLAG_BACKWARD) < 0) return -1;
        avcodec_flush_buffers(r->dec);
        r->next_index = 0;
      }
    }
  }
  // roll forward
  while (r->next_index <= target) {
    if (decode_next(r) < 0) return -1;
    r->next_index++;
  }
  return 1;
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  auto* r = new Reader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) { delete r; return nullptr; }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) { avformat_close_input(&r->fmt); delete r; return nullptr; }
  const AVCodec* codec = nullptr;
  r->stream_index = av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (r->stream_index < 0 || !codec) { avformat_close_input(&r->fmt); delete r; return nullptr; }
  AVStream* st = r->fmt->streams[r->stream_index];
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  r->dec->thread_count = 0;  // auto
  if (avcodec_open2(r->dec, codec, nullptr) < 0) {
    avcodec_free_context(&r->dec); avformat_close_input(&r->fmt); delete r; return nullptr;
  }
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  r->fps = fr.den ? av_q2d(fr) : 0.0;
  r->n_frames = st->nb_frames;
  if (r->n_frames <= 0 && r->fps > 0 && r->fmt->duration > 0)
    r->n_frames = static_cast<int64_t>(r->fmt->duration / (double)AV_TIME_BASE * r->fps + 0.5);
  r->pkt = av_packet_alloc();
  r->frame = av_frame_alloc();
  if (r->n_frames <= 0) r->n_frames = count_frames_by_scan(r);
  return r;
}

long vd_len(void* h) { return static_cast<Reader*>(h)->n_frames; }
double vd_fps(void* h) { return static_cast<Reader*>(h)->fps; }

// Decode frames at `indices` (n of them), resize to (out_w, out_h) RGB24,
// write into out (n * out_h * out_w * 3 bytes). out_w/out_h == 0 keeps the
// native resolution (then nat_w/nat_h report it; buffer must fit).
// Returns 0 on success, <0 on error.
int vd_get_batch(void* h, const long* indices, int n, int out_w, int out_h,
                 uint8_t* out, int* nat_w, int* nat_h) {
  auto* r = static_cast<Reader*>(h);
  if (nat_w) *nat_w = r->dec->width;
  if (nat_h) *nat_h = r->dec->height;
  int w = out_w > 0 ? out_w : r->dec->width;
  int ht = out_h > 0 ? out_h : r->dec->height;
  SwsContext* sws = nullptr;
  const size_t frame_bytes = static_cast<size_t>(w) * ht * 3;
  for (int i = 0; i < n; i++) {
    int64_t idx = indices[i];
    if (idx < 0) idx = 0;
    if (idx >= r->n_frames) idx = r->n_frames - 1;
    // reuse the previous decode when indices repeat
    if (!(i > 0 && indices[i] == indices[i - 1])) {
      if (seek_to(r, idx) < 0) { if (sws) sws_freeContext(sws); return -2; }
    }
    sws = sws_getCachedContext(sws, r->frame->width, r->frame->height,
                               (AVPixelFormat)r->frame->format, w, ht,
                               AV_PIX_FMT_RGB24, SWS_BICUBIC, nullptr, nullptr, nullptr);
    if (!sws) return -3;
    uint8_t* dst[1] = {out + i * frame_bytes};
    int dst_stride[1] = {w * 3};
    sws_scale(sws, r->frame->data, r->frame->linesize, 0, r->frame->height, dst, dst_stride);
  }
  if (sws) sws_freeContext(sws);
  return 0;
}

// Decode frames at `indices`, scale to (out_w, out_h) planar YUV420 with
// FULL-RANGE BT.601 ("JPEG") values, write I420 planes contiguously into
// out: per frame Y (w*h) then U (w/2*h/2) then V (w/2*h/2). Shipping
// YUV420 instead of RGB24 halves the bytes crossing the host->device link;
// the colorspace conversion runs inside the device program
// (vidil_tpu/ops/image.py:yuv420_to_rgb). out_w/out_h must be even and > 0.
// Returns 0 on success, <0 on error.
int vd_get_batch_yuv(void* h, const long* indices, int n, int out_w, int out_h,
                     uint8_t* out, int* nat_w, int* nat_h) {
  auto* r = static_cast<Reader*>(h);
  if (nat_w) *nat_w = r->dec->width;
  if (nat_h) *nat_h = r->dec->height;
  if (out_w <= 0 || out_h <= 0 || (out_w & 1) || (out_h & 1)) return -4;
  const int w = out_w, ht = out_h;
  SwsContext* sws = nullptr;
  const size_t y_bytes = static_cast<size_t>(w) * ht;
  const size_t c_bytes = static_cast<size_t>(w / 2) * (ht / 2);
  const size_t frame_bytes = y_bytes + 2 * c_bytes;
  for (int i = 0; i < n; i++) {
    int64_t idx = indices[i];
    if (idx < 0) idx = 0;
    if (idx >= r->n_frames) idx = r->n_frames - 1;
    if (!(i > 0 && indices[i] == indices[i - 1])) {
      if (seek_to(r, idx) < 0) { if (sws) sws_freeContext(sws); return -2; }
    }
    sws = sws_getCachedContext(sws, r->frame->width, r->frame->height,
                               (AVPixelFormat)r->frame->format, w, ht,
                               AV_PIX_FMT_YUV420P, SWS_BICUBIC, nullptr, nullptr, nullptr);
    if (!sws) return -3;
    // force full-range BT.601 output regardless of the stream's own
    // range/matrix so the device-side inverse is a single fixed transform
    const int* src_coef = sws_getCoefficients(
        r->frame->colorspace == AVCOL_SPC_BT709 ? SWS_CS_ITU709 : SWS_CS_ITU601);
    const int* dst_coef = sws_getCoefficients(SWS_CS_ITU601);
    int src_range = r->frame->color_range == AVCOL_RANGE_JPEG ? 1 : 0;
    sws_setColorspaceDetails(sws, src_coef, src_range, dst_coef, /*dstRange=*/1,
                             0, 1 << 16, 1 << 16);
    uint8_t* base = out + i * frame_bytes;
    uint8_t* dst[3] = {base, base + y_bytes, base + y_bytes + c_bytes};
    int dst_stride[3] = {w, w / 2, w / 2};
    sws_scale(sws, r->frame->data, r->frame->linesize, 0, r->frame->height, dst, dst_stride);
  }
  if (sws) sws_freeContext(sws);
  return 0;
}

void vd_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

}  // extern "C"
