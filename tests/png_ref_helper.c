/* Test-only helper driving the SYSTEM libpng (compiled by the test
 * suite when gcc + png.h are present, else the cross-validation tests
 * skip): writes REAL libpng-encoded files across bit depths, color
 * types and Adam7 interlacing, so the pure-Python PNG decoder is
 * validated pixel-exact against an independent implementation.
 *
 *   encode <w> <h> <color_type> <bit_depth> <interlace> < raw > out.png
 *     raw = 8-bit samples, one byte per channel-sample (the helper
 *     packs/scales to the requested depth)
 */
#include <png.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(2); }

int main(int argc, char **argv) {
  if (argc != 7 || strcmp(argv[1], "encode")) die("usage");
  int w = atoi(argv[2]), h = atoi(argv[3]);
  int ct = atoi(argv[4]), depth = atoi(argv[5]), inter = atoi(argv[6]);
  int ch = (ct == PNG_COLOR_TYPE_RGB) ? 3 :
           (ct == PNG_COLOR_TYPE_RGB_ALPHA) ? 4 :
           (ct == PNG_COLOR_TYPE_GRAY_ALPHA) ? 2 : 1;
  size_t n = (size_t)w * h * ch;
  unsigned char *buf = malloc(n);
  if (!buf || fread(buf, 1, n, stdin) != n) die("short raw");

  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                            NULL, NULL, NULL);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) die("libpng error");
  png_init_io(png, stdout);
  png_set_IHDR(png, info, w, h, depth, ct,
               inter ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_color pal[256];
  if (ct == PNG_COLOR_TYPE_PALETTE) {
    int i;
    for (i = 0; i < 256; i++) {   /* deterministic palette */
      pal[i].red = (png_byte)(i * 3);
      pal[i].green = (png_byte)(255 - i);
      pal[i].blue = (png_byte)(i * 7);
    }
    png_set_PLTE(png, info, pal, 1 << (depth > 8 ? 8 : depth));
  }
  png_write_info(png, info);

  /* pack 8-bit input samples down to the target depth */
  int row_bytes = (w * ch * depth + 7) / 8;
  unsigned char *row = malloc(row_bytes);
  int y;
  png_bytep *rows = malloc(sizeof(png_bytep) * h);
  unsigned char *all = malloc((size_t)row_bytes * h);
  for (y = 0; y < h; y++) {
    unsigned char *src = buf + (size_t)y * w * ch;
    unsigned char *dst = all + (size_t)y * row_bytes;
    memset(dst, 0, row_bytes);
    if (depth == 8) {
      memcpy(dst, src, (size_t)w * ch);
    } else if (depth == 16) {
      int i;
      for (i = 0; i < w * ch; i++) {     /* hi = sample, lo = derived */
        dst[2 * i] = src[i];
        dst[2 * i + 1] = (unsigned char)(src[i] * 3);
      }
    } else {
      int i, per = 8 / depth, mask = (1 << depth) - 1;
      for (i = 0; i < w * ch; i++) {
        int v = src[i] & mask;
        dst[i / per] |= v << (8 - depth - (i % per) * depth);
      }
    }
    rows[y] = all + (size_t)y * row_bytes;
  }
  png_write_image(png, rows);
  png_write_end(png, NULL);
  png_destroy_write_struct(&png, &info);
  return 0;
}
