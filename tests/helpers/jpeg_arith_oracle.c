/* Arithmetic-JPEG test oracle backed by the SYSTEM libjpeg.
 *
 * Modes:
 *   encode  <w> <h> <ncomp> <quality> <progressive 0|1> <subsample 0|1> [restart]
 *           stdin:  w*h*ncomp raw bytes (RGB or grayscale rows)
 *           stdout: arithmetic-coded JPEG (cinfo.arith_code = TRUE)
 *   decode  stdin: JPEG  stdout: <w> <h> <ncomp> header line + raw pixels
 *   coefs   stdin: JPEG  stdout: per component "C <ci> <rows> <cols>" then
 *           rows*cols*64 int16 LE coefficients in ZIG-ZAG order
 *
 * Compiled on demand by tests/test_jpeg_arith.py (skipped when gcc or
 * jpeglib headers are absent). Exists so the pure-Python arithmetic
 * decoder is validated against the reference codec at the exact
 * coefficient level, not just via pixel tolerance.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(2); }

static unsigned char *read_all(FILE *f, size_t *n) {
    size_t cap = 1 << 20, len = 0;
    unsigned char *buf = malloc(cap);
    if (!buf) die("oom");
    for (;;) {
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); if (!buf) die("oom"); }
        size_t got = fread(buf + len, 1, cap - len, f);
        if (!got) break;
        len += got;
    }
    *n = len;
    return buf;
}

static int do_encode(int w, int h, int ncomp, int quality, int progressive,
                     int subsample, int restart) {
    size_t need = (size_t)w * h * ncomp, n;
    unsigned char *pixels = read_all(stdin, &n);
    if (n < need) die("short pixel input");
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    unsigned char *out = NULL;
    unsigned long outlen = 0;
    jpeg_mem_dest(&cinfo, &out, &outlen);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ncomp;
    cinfo.in_color_space = ncomp == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = TRUE;
    cinfo.restart_interval = restart;
    if (!subsample && ncomp == 3) {
        int ci;
        for (ci = 0; ci < 3; ci++) {
            cinfo.comp_info[ci].h_samp_factor = 1;
            cinfo.comp_info[ci].v_samp_factor = 1;
        }
    }
    if (progressive)
        jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = pixels + (size_t)cinfo.next_scanline * w * ncomp;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    fwrite(out, 1, outlen, stdout);
    jpeg_destroy_compress(&cinfo);
    return 0;
}

static int do_decode(void) {
    size_t n;
    unsigned char *data = read_all(stdin, &n);
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, n);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) die("bad header");
    jpeg_start_decompress(&cinfo);
    printf("%d %d %d\n", cinfo.output_width, cinfo.output_height,
           cinfo.output_components);
    fflush(stdout);
    size_t stride = (size_t)cinfo.output_width * cinfo.output_components;
    unsigned char *row = malloc(stride);
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW r = row;
        jpeg_read_scanlines(&cinfo, &r, 1);
        fwrite(row, 1, stride, stdout);
    }
    jpeg_finish_decompress(&cinfo);
    return 0;
}

static int do_coefs(void) {
    size_t n;
    unsigned char *data = read_all(stdin, &n);
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, n);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) die("bad header");
    jvirt_barray_ptr *arrays = jpeg_read_coefficients(&cinfo);
    if (!arrays) die("no coefficients");
    int ci;
    for (ci = 0; ci < cinfo.num_components; ci++) {
        jpeg_component_info *comp = &cinfo.comp_info[ci];
        JDIMENSION rows = comp->height_in_blocks, cols = comp->width_in_blocks;
        printf("C %d %u %u\n", ci, rows, cols);
        fflush(stdout);
        JDIMENSION r;
        for (r = 0; r < rows; r++) {
            JBLOCKARRAY rowp = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, arrays[ci], r, 1, FALSE);
            JDIMENSION c;
            for (c = 0; c < cols; c++)
                fwrite(rowp[0][c], sizeof(JCOEF), DCTSIZE2, stdout);
        }
    }
    jpeg_finish_decompress(&cinfo);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && !strcmp(argv[1], "encode")) {
        if (argc < 8) die("usage: encode w h ncomp quality progressive subsample [restart]");
        return do_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                         atoi(argv[5]), atoi(argv[6]), atoi(argv[7]),
                         argc > 8 ? atoi(argv[8]) : 0);
    }
    if (argc >= 2 && !strcmp(argv[1], "decode")) return do_decode();
    if (argc >= 2 && !strcmp(argv[1], "coefs")) return do_coefs();
    die("usage: jpeg_arith_oracle encode|decode|coefs ...");
    return 2;
}
