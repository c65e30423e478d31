/* Standalone MP3 -> PCM oracle built on the system libavcodec (ffmpeg).
 *
 * Second, independent decoder for the interop suite: libmpg123 and
 * libavcodec share no code, so behavior both agree on is the de-facto
 * ecosystem contract (used to arbitrate crafted-stream cases where
 * mpg123's fast paths reject spec-shaped input).
 *
 * stdin:  raw MP3 byte stream
 * stdout: "AVPC" magic, int32 sample_rate, int32 channels, then
 *         interleaved float32 PCM in [-1, 1] (one frame per MP3 frame,
 *         no gapless trimming -- same convention as the mpg123 oracle).
 *
 * Built lazily by tests/interop_codecs.py:
 *   gcc -O2 av_decode.c -o av_decode -lavcodec -lavutil
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>

static void die(const char *msg) {
  fprintf(stderr, "av_decode: %s\n", msg);
  exit(1);
}

int main(void) {
  /* mp3float: the float reference implementation (no fixed-point rounding,
   * comparable against a float64 decode chain at high SNR) */
  const AVCodec *codec = avcodec_find_decoder_by_name("mp3float");
  if (!codec) codec = avcodec_find_decoder(AV_CODEC_ID_MP3);
  if (!codec) die("no mp3 decoder in libavcodec");
  AVCodecContext *ctx = avcodec_alloc_context3(codec);
  if (!ctx || avcodec_open2(ctx, codec, NULL) < 0) die("open failed");
  AVCodecParserContext *parser = av_parser_init(codec->id);
  if (!parser) die("no parser");
  /* decode every frame as-is, including the first */
  parser->flags |= PARSER_FLAG_COMPLETE_FRAMES;

  /* slurp stdin */
  size_t cap = 1 << 20, len = 0;
  uint8_t *buf = malloc(cap + AV_INPUT_BUFFER_PADDING_SIZE);
  for (;;) {
    if (len == cap) {
      cap *= 2;
      buf = realloc(buf, cap + AV_INPUT_BUFFER_PADDING_SIZE);
    }
    size_t r = fread(buf + len, 1, cap - len, stdin);
    if (!r) break;
    len += r;
  }
  memset(buf + len, 0, AV_INPUT_BUFFER_PADDING_SIZE);

  AVPacket *pkt = av_packet_alloc();
  AVFrame *frame = av_frame_alloc();
  int wrote_header = 0;
  size_t pos = 0;
  while (pos < len) {
    uint8_t *data = NULL;
    int size = 0;
    int used = av_parser_parse2(parser, ctx, &data, &size, buf + pos,
                                (int)(len - pos), AV_NOPTS_VALUE,
                                AV_NOPTS_VALUE, 0);
    if (used < 0) break;
    pos += (size_t)used;
    if (!size) continue;
    pkt->data = data;
    pkt->size = size;
    if (avcodec_send_packet(ctx, pkt) < 0) continue;
    while (avcodec_receive_frame(ctx, frame) == 0) {
      int ch = ctx->ch_layout.nb_channels;
      if (!wrote_header) {
        int32_t hdr[2] = {ctx->sample_rate, ch};
        fwrite("AVPC", 1, 4, stdout);
        fwrite(hdr, 4, 2, stdout);
        wrote_header = 1;
      }
      /* FLTP (planar) -> interleaved f32 */
      for (int i = 0; i < frame->nb_samples; i++)
        for (int c = 0; c < ch; c++) {
          float v = ((float *)frame->extended_data[c])[i];
          fwrite(&v, 4, 1, stdout);
        }
    }
  }
  if (!wrote_header) die("no frames decoded");
  return 0;
}
