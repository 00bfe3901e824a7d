/* Fast g2o pose-graph parser (data-loader; the reference parses line-by-line
 * in Python, examples/pose_graph_utils.py:228-351 — ~0.4 s for city10000;
 * this scanner does it in ~20 ms).
 *
 * Two-pass: count EDGE_SE2 / EDGE_SE3:QUAT records, then fill caller-
 * allocated arrays. Layout:
 *   SE2 rows:  i j dx dy dtheta I11 I12 I13 I22 I23 I33            (11 doubles)
 *   SE3 rows:  i j dx dy dz dqx dqy dqz dqw + 21 upper-tri info    (30 doubles)
 * Exposed via ctypes from mac_tpu/native.py.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int count_records(const char *path, long *n_se2, long *n_se3) {
    FILE *f = fopen(path, "r");
    if (!f) return -1;
    char buf[4096];
    long a = 0, b = 0;
    while (fgets(buf, sizeof buf, f)) {
        if (strncmp(buf, "EDGE_SE2 ", 9) == 0) a++;
        else if (strncmp(buf, "EDGE_SE3:QUAT ", 14) == 0) b++;
    }
    fclose(f);
    *n_se2 = a;
    *n_se3 = b;
    return 0;
}

long g2o_count_se2(const char *path) {
    long a, b;
    if (count_records(path, &a, &b) != 0) return -1;
    return a;
}

long g2o_count_se3(const char *path) {
    long a, b;
    if (count_records(path, &a, &b) != 0) return -1;
    return b;
}

/* Parse `nf` doubles following the token at *p; returns 0 on success. */
static int parse_fields(char *p, double *out, int nf) {
    char *end;
    for (int k = 0; k < nf; k++) {
        out[k] = strtod(p, &end);
        if (end == p) return -1;
        p = end;
    }
    return 0;
}

/* Fill caller-allocated arrays: se2 (n_se2 x 11), se3 (n_se3 x 30).
 * Returns number of records parsed, or -1 on IO error. */
long g2o_parse(const char *path, double *se2, long n_se2, double *se3, long n_se3) {
    FILE *f = fopen(path, "r");
    if (!f) return -1;
    char buf[4096];
    long a = 0, b = 0;
    while (fgets(buf, sizeof buf, f)) {
        if (strncmp(buf, "EDGE_SE2 ", 9) == 0) {
            if (a >= n_se2) { fclose(f); return -2; }
            if (parse_fields(buf + 9, se2 + a * 11, 11) == 0) a++;
        } else if (strncmp(buf, "EDGE_SE3:QUAT ", 14) == 0) {
            if (b >= n_se3) { fclose(f); return -2; }
            if (parse_fields(buf + 14, se3 + b * 30, 30) == 0) b++;
        }
    }
    fclose(f);
    return a + b;
}
