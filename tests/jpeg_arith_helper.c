/* Test-only helper driving the SYSTEM libjpeg (tests compile it with
 * gcc when available, else the arithmetic-JPEG tests skip): produces
 * REAL arithmetic-coded JPEG bitstreams and dumps entropy-decoded DCT
 * coefficients, so the pure-Python QM-coder in
 * livre_spark/functions/jpeg.py is validated coefficient-exact against
 * an independent implementation.
 *
 *   encode <w> <h> <nc> <quality> <progressive> [arith=1] [restart=0] < raw > out.jpg
 *   coefs  < in.jpg > per-component: "C bw bh\n" + int32 LE blocks
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(2); }

static void encode(int w, int h, int nc, int quality, int progressive,
                   int arith, int restart, int hsamp, int vsamp) {
  struct jpeg_compress_struct c;
  struct jpeg_error_mgr err;
  unsigned char *row;
  size_t n = (size_t)w * h * nc;
  unsigned char *buf = malloc(n);
  if (!buf || fread(buf, 1, n, stdin) != n) die("short raw input");
  c.err = jpeg_std_error(&err);
  jpeg_create_compress(&c);
  jpeg_stdio_dest(&c, stdout);
  c.image_width = w;
  c.image_height = h;
  c.input_components = nc;
  c.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.arith_code = arith ? TRUE : FALSE;
  c.optimize_coding = FALSE;
  c.restart_interval = restart;
  if (hsamp > 0 && nc == 3) {
    c.comp_info[0].h_samp_factor = hsamp;
    c.comp_info[0].v_samp_factor = vsamp;
  }
  if (progressive) jpeg_simple_progression(&c);
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    row = buf + (size_t)c.next_scanline * w * nc;
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  free(buf);
}

static void coefs(void) {
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr err;
  jvirt_barray_ptr *arrays;
  int ci;
  d.err = jpeg_std_error(&err);
  jpeg_create_decompress(&d);
  jpeg_stdio_src(&d, stdin);
  if (jpeg_read_header(&d, TRUE) != JPEG_HEADER_OK) die("bad header");
  arrays = jpeg_read_coefficients(&d);
  if (!arrays) die("no coefficients");
  for (ci = 0; ci < d.num_components; ci++) {
    jpeg_component_info *comp = &d.comp_info[ci];
    int bw = comp->width_in_blocks, bh = comp->height_in_blocks;
    int by, bx, k;
    printf("C %d %d\n", bw, bh);
    fflush(stdout);
    for (by = 0; by < bh; by++) {
      JBLOCKARRAY rows = (d.mem->access_virt_barray)(
          (j_common_ptr)&d, arrays[ci], by, 1, FALSE);
      for (bx = 0; bx < bw; bx++)
        for (k = 0; k < DCTSIZE2; k++) {
          int v = rows[0][bx][k];
          fwrite(&v, 4, 1, stdout);
        }
    }
    fflush(stdout);
  }
  jpeg_finish_decompress(&d);
  jpeg_destroy_decompress(&d);
}

int main(int argc, char **argv) {
  if (argc >= 2 && !strcmp(argv[1], "encode")) {
    if (argc < 7) die("usage: encode w h nc quality progressive [arith]");
    encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]), atoi(argv[5]),
           atoi(argv[6]), argc > 7 ? atoi(argv[7]) : 1,
           argc > 8 ? atoi(argv[8]) : 0, argc > 9 ? atoi(argv[9]) : 0,
           argc > 10 ? atoi(argv[10]) : 0);
    return 0;
  }
  if (argc >= 2 && !strcmp(argv[1], "coefs")) {
    coefs();
    return 0;
  }
  die("usage: encode|coefs ...");
  return 2;
}
