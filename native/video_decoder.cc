// grove_tpu native video decoder.
//
// TPU-native replacement for the reference's host video I/O, which spawns one
// `ffmpeg -ss T -i clip.mp4 -vframes 1` subprocess PER FRAME
// (reference dataset/video_grounding_datasets/HowTo100M.py:281-306). Here a
// clip is opened once (demuxer + codec state persist), requested timestamps
// are served by a single forward sweep with keyframe seeks only when the gap
// warrants it, and scaling/RGB conversion runs through swscale. Exposed as a
// C ABI for ctypes (no pybind11 in this image).
//
// Thread-safety: one VDContext per thread/clip; no globals. ctypes releases
// the GIL during calls, so Python-side thread pools parallelize across clips.

#include <algorithm>
#include <cmath>
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

struct VDContext {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  int sws_w = 0, sws_h = 0;
  SwsContext* sws_yuv = nullptr;
  int sws_yuv_w = 0, sws_yuv_h = 0;
  int stream_index = -1;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  double last_decoded_ts = -1e30;
  bool eof = false;
  std::string error;
};

double stream_ts(const VDContext* c, const AVFrame* f) {
  int64_t pts = f->best_effort_timestamp;
  if (pts == AV_NOPTS_VALUE) pts = f->pts;
  if (pts == AV_NOPTS_VALUE) return c->last_decoded_ts;
  AVRational tb = c->fmt->streams[c->stream_index]->time_base;
  return pts * av_q2d(tb);
}

// Decode the next frame into c->frame. Returns 1 on success, 0 on EOF,
// negative on error.
int decode_next(VDContext* c) {
  while (true) {
    int ret = avcodec_receive_frame(c->codec, c->frame);
    if (ret == 0) {
      c->last_decoded_ts = stream_ts(c, c->frame);
      return 1;
    }
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) return ret;

    // feed more packets
    while (true) {
      ret = av_read_frame(c->fmt, c->pkt);
      if (ret == AVERROR_EOF) {
        avcodec_send_packet(c->codec, nullptr);  // flush
        break;
      }
      if (ret < 0) return ret;
      if (c->pkt->stream_index == c->stream_index) {
        ret = avcodec_send_packet(c->codec, c->pkt);
        av_packet_unref(c->pkt);
        if (ret < 0 && ret != AVERROR(EAGAIN)) return ret;
        break;
      }
      av_packet_unref(c->pkt);
    }
  }
}

int seek_to(VDContext* c, double ts) {
  AVRational tb = c->fmt->streams[c->stream_index]->time_base;
  int64_t target = (int64_t)llround(ts / av_q2d(tb));
  int ret = av_seek_frame(c->fmt, c->stream_index, target,
                          AVSEEK_FLAG_BACKWARD);
  if (ret < 0) return ret;
  avcodec_flush_buffers(c->codec);
  c->last_decoded_ts = -1e30;
  c->eof = false;
  return 0;
}

void scale_into(VDContext* c, uint8_t* out, int out_w, int out_h) {
  if (out_w <= 0) out_w = c->codec->width;
  if (out_h <= 0) out_h = c->codec->height;
  if (!c->sws || c->sws_w != out_w || c->sws_h != out_h) {
    if (c->sws) sws_freeContext(c->sws);
    c->sws = sws_getContext(c->codec->width, c->codec->height,
                            c->codec->pix_fmt, out_w, out_h, AV_PIX_FMT_RGB24,
                            SWS_BILINEAR, nullptr, nullptr, nullptr);
    c->sws_w = out_w;
    c->sws_h = out_h;
  }
  uint8_t* dst[4] = {out, nullptr, nullptr, nullptr};
  int dst_linesize[4] = {3 * out_w, 0, 0, 0};
  sws_scale(c->sws, c->frame->data, c->frame->linesize, 0, c->codec->height,
            dst, dst_linesize);
}

// YUV420P variant: skips the RGB conversion entirely (the stream is
// already 4:2:0 for every codec this pipeline sees, so this is a
// plane copy/scale) and writes a PACKED (3*out_h/2, out_w) uint8 frame:
// Y rows [0, h); U and V (h/2, w/2) side by side in rows [h, 3h/2) —
// U in columns [0, w/2), V in [w/2, w). Host->device bytes drop to
// 1.5 B/px vs RGB24's 3; the model converts + resizes in-graph
// (grove_tpu.models.grove.GroveModel._yuv420_to_rgb).
void scale_into_yuv(VDContext* c, uint8_t* out, int out_w, int out_h) {
  if (out_w <= 0) out_w = c->codec->width;
  if (out_h <= 0) out_h = c->codec->height;
  if (!c->sws_yuv || c->sws_yuv_w != out_w || c->sws_yuv_h != out_h) {
    if (c->sws_yuv) sws_freeContext(c->sws_yuv);
    c->sws_yuv = sws_getContext(c->codec->width, c->codec->height,
                                c->codec->pix_fmt, out_w, out_h,
                                AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                nullptr, nullptr);
    c->sws_yuv_w = out_w;
    c->sws_yuv_h = out_h;
  }
  uint8_t* dst[4] = {out, out + (size_t)out_h * out_w,
                     out + (size_t)out_h * out_w + out_w / 2, nullptr};
  int dst_linesize[4] = {out_w, out_w, out_w, 0};
  sws_scale(c->sws_yuv, c->frame->data, c->frame->linesize, 0,
            c->codec->height, dst, dst_linesize);
}

// Shared timestamp sweep for vd_decode_at{,_yuv}: seek/advance logic is
// identical, only the per-frame emit differs.
template <typename Emit>
int decode_at_sweep(VDContext* c, const double* timestamps, int n,
                    double seek_gap, Emit emit) {
  if (seek_gap <= 0) seek_gap = 4.0;
  int written = 0;
  bool have_frame = false;
  for (int i = 0; i < n; i++) {
    double want = timestamps[i];
    if (!have_frame || c->last_decoded_ts > want + 0.5 ||
        want - c->last_decoded_ts > seek_gap) {
      if (seek_to(c, std::max(0.0, want)) < 0) break;
      have_frame = false;
    }
    while (!have_frame || c->last_decoded_ts < want - 1e-6) {
      int ret = decode_next(c);
      if (ret <= 0) break;
      have_frame = true;
      if (c->last_decoded_ts >= want - 1e-6) break;
    }
    if (!have_frame) break;
    emit(written);
    written++;
  }
  return written;
}

}  // namespace

extern "C" {

void* vd_open(const char* path) {
  auto* c = new VDContext();
  if (avformat_open_input(&c->fmt, path, nullptr, nullptr) < 0) {
    delete c;
    return nullptr;
  }
  if (avformat_find_stream_info(c->fmt, nullptr) < 0) {
    avformat_close_input(&c->fmt);
    delete c;
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  c->stream_index =
      av_find_best_stream(c->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (c->stream_index < 0 || !dec) {
    avformat_close_input(&c->fmt);
    delete c;
    return nullptr;
  }
  c->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(c->codec,
                                c->fmt->streams[c->stream_index]->codecpar);
  c->codec->thread_count = 0;  // auto
  if (avcodec_open2(c->codec, dec, nullptr) < 0) {
    avcodec_free_context(&c->codec);
    avformat_close_input(&c->fmt);
    delete c;
    return nullptr;
  }
  c->frame = av_frame_alloc();
  c->pkt = av_packet_alloc();
  return c;
}

void vd_close(void* handle) {
  auto* c = static_cast<VDContext*>(handle);
  if (!c) return;
  if (c->sws) sws_freeContext(c->sws);
  if (c->sws_yuv) sws_freeContext(c->sws_yuv);
  if (c->frame) av_frame_free(&c->frame);
  if (c->pkt) av_packet_free(&c->pkt);
  if (c->codec) avcodec_free_context(&c->codec);
  if (c->fmt) avformat_close_input(&c->fmt);
  delete c;
}

// duration (s), avg fps, width, height. Returns 0 on success.
int vd_info(void* handle, double* duration, double* fps, int* width,
            int* height) {
  auto* c = static_cast<VDContext*>(handle);
  AVStream* st = c->fmt->streams[c->stream_index];
  double dur = 0.0;
  if (st->duration != AV_NOPTS_VALUE)
    dur = st->duration * av_q2d(st->time_base);
  else if (c->fmt->duration != AV_NOPTS_VALUE)
    dur = c->fmt->duration / (double)AV_TIME_BASE;
  *duration = dur;
  AVRational r = st->avg_frame_rate;
  *fps = (r.den > 0) ? av_q2d(r) : 0.0;
  *width = c->codec->width;
  *height = c->codec->height;
  return 0;
}

// Decode the frames covering each (sorted ascending) timestamp into
// out (n, out_h, out_w, 3) uint8 RGB. A timestamp is served by the first
// frame whose ts >= requested - eps; seeks happen only when jumping
// backward or > seek_gap seconds forward. Returns number of frames written.
int vd_decode_at(void* handle, const double* timestamps, int n, uint8_t* out,
                 int out_w, int out_h, double seek_gap) {
  auto* c = static_cast<VDContext*>(handle);
  const size_t frame_bytes = (size_t)out_w * out_h * 3;
  return decode_at_sweep(c, timestamps, n, seek_gap, [&](int k) {
    scale_into(c, out + (size_t)k * frame_bytes, out_w, out_h);
  });
}

// As vd_decode_at, but emits packed YUV420P frames of
// (3*out_h/2, out_w) uint8 (see scale_into_yuv). out_w and out_h must
// be even. Returns number of frames written, or -1 on odd dims.
int vd_decode_at_yuv(void* handle, const double* timestamps, int n,
                     uint8_t* out, int out_w, int out_h, double seek_gap) {
  auto* c = static_cast<VDContext*>(handle);
  if (out_w <= 0) out_w = c->codec->width;
  if (out_h <= 0) out_h = c->codec->height;
  if ((out_w | out_h) & 1) return -1;
  const size_t frame_bytes = (size_t)out_w * out_h * 3 / 2;
  return decode_at_sweep(c, timestamps, n, seek_gap, [&](int k) {
    scale_into_yuv(c, out + (size_t)k * frame_bytes, out_w, out_h);
  });
}

// Decode the whole stream resampled at `fps` (like the reference's
// `ffmpeg -vf fps=5` full-clip decode, infer_iground.py:320-435), up to
// max_frames. Returns number of frames written.
int vd_decode_fps(void* handle, double fps, uint8_t* out, int out_w,
                  int out_h, int max_frames) {
  auto* c = static_cast<VDContext*>(handle);
  const size_t frame_bytes = (size_t)out_w * out_h * 3;
  if (seek_to(c, 0.0) < 0) return 0;

  int written = 0;
  double next_tick = -1e30;
  double first_ts = 0.0;
  bool first = true;
  while (written < max_frames) {
    int ret = decode_next(c);
    if (ret <= 0) break;
    if (first) {
      first_ts = c->last_decoded_ts;
      next_tick = first_ts;
      first = false;
    }
    if (c->last_decoded_ts + 1e-9 >= next_tick) {
      scale_into(c, out + (size_t)written * frame_bytes, out_w, out_h);
      written++;
      // skip ticks already behind the stream position
      while (next_tick <= c->last_decoded_ts + 1e-9) next_tick += 1.0 / fps;
    }
  }
  return written;
}

}  // extern "C"
