// Shim signal-IO layer for building the reference RawAlign binary
// WITHOUT HDF5 (no HDF5 dev headers exist in this environment; the
// reference's vendored extern/hdf5 submodule is empty).
//
// scripts/build_reference.sh copies /root/reference/src to a scratch
// build tree, removes ONLY the three HDF5-dependent functions from
// rsig.cpp (ri_sig_open / ri_sig_close / ri_read_sig,
// rsig.cpp:43-111,186-230) and compiles this file in their place.
// Every compute component (revent.c, rsketch.c, rawindex.cpp, rmap.cpp,
// dtw.cpp, kthread.c, ...) builds unmodified, so the measured baseline
// is the reference's real mapping pipeline; only the container format
// differs (a plain binary "SRAWBIN1" stream instead of HDF5 FAST5).
//
// SRAW format (written by tools/ref_baseline.py):
//   char[8]  magic = "SRAWBIN1"
//   uint32   n_reads
//   per read:
//     uint32  name_len;  char[name_len] name (no NUL)
//     float   digitisation, range, offset
//     uint32  n_samples; int16[n_samples] raw
//
// ri_read_sig reproduces the reference's pA conversion + (30,200) clip
// (rsig.cpp:216-224) on the raw DAC values so the mapping pipeline sees
// byte-identical inputs to what the HDF5 path would produce.

#include "rsig.h"

#include <assert.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    FILE *f;
} sraw_file_t;

extern "C" ri_sig_file_t *ri_sig_open(const char *fn) {
    FILE *f = fopen(fn, "rb");
    if (!f) return 0;
    char magic[8];
    if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "SRAWBIN1", 8) != 0) {
        fclose(f);
        return 0;
    }
    uint32_t n_reads = 0;
    if (fread(&n_reads, 4, 1, f) != 1) {
        fclose(f);
        return 0;
    }
    ri_sig_file_t *fp = (ri_sig_file_t *)calloc(1, sizeof(ri_sig_file_t));
    sraw_file_t *sf = (sraw_file_t *)calloc(1, sizeof(sraw_file_t));
    sf->f = f;
    fp->fp = (hdf5_tools::File *)sf;
    fp->num_read = (int)n_reads;
    fp->cur_read = 0;
    fp->raw_path = 0;
    fp->ch_path = 0;
    return fp;
}

extern "C" void ri_sig_close(ri_sig_file_t *fp) {
    if (!fp) return;
    sraw_file_t *sf = (sraw_file_t *)fp->fp;
    if (sf) {
        if (sf->f) fclose(sf->f);
        free(sf);
    }
    free(fp);
}

extern "C" void ri_read_sig(ri_sig_file_t *fp, ri_sig_t *s) {
    assert(fp->cur_read < fp->num_read);
    sraw_file_t *sf = (sraw_file_t *)fp->fp;
    FILE *f = sf->f;

    uint32_t name_len = 0;
    if (fread(&name_len, 4, 1, f) != 1) {
        fprintf(stderr, "ERROR: truncated sraw record header\n");
        exit(1);
    }
    s->name = (char *)calloc(name_len + 1, 1);
    if (name_len && fread(s->name, 1, name_len, f) != name_len) {
        fprintf(stderr, "ERROR: truncated sraw name\n");
        exit(1);
    }
    float meta[3];
    uint32_t n = 0;
    if (fread(meta, 4, 3, f) != 3 || fread(&n, 4, 1, f) != 1) {
        fprintf(stderr, "ERROR: truncated sraw meta\n");
        exit(1);
    }
    s->dig = meta[0];
    s->ran = meta[1];
    s->offset = meta[2];
    int16_t *raw = (int16_t *)malloc((size_t)n * sizeof(int16_t));
    if (n && fread(raw, sizeof(int16_t), n, f) != n) {
        fprintf(stderr, "ERROR: truncated sraw signal\n");
        exit(1);
    }
    // identical arithmetic to the reference HDF5 path (rsig.cpp:216-224)
    uint32_t l_sig = 0;
    float scale = s->ran / s->dig;
    float *sig = (float *)calloc(n ? n : 1, sizeof(float));
    for (uint32_t i = 0; i < n; i++) {
        float original_sig = ((float)raw[i] + s->offset) * scale;
        if (original_sig > 30 && original_sig < 200) sig[l_sig++] = original_sig;
    }
    free(raw);
    s->sig = sig;
    s->l_sig = l_sig;
    fp->cur_read++;
}
