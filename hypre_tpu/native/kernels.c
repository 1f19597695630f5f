/* Native host-setup kernels.
 *
 * Reference analog: the reference's setup-time graph algorithms are C
 * (par_relax.c:472-560 level-set DAG scheduling, par_coarsen.c:874 RS
 * first pass); SURVEY §2.13 calls for C++ helpers where Python setup
 * loops are too slow.  Compiled to a shared object at import time
 * (hypre_tpu/native/__init__.py) and bound with ctypes; a pure-numpy
 * fallback keeps the package functional without a toolchain.
 */

#include <stdint.h>
#include <stdlib.h>

/* Wavefront levels of the lower(upper)-triangular dependency DAG:
 * level[i] = 1 + max(level[j]) over j < i (forward) with A[i,j] != 0. */
void gs_levels(const int64_t *indptr, const int64_t *indices, int64_t n,
               int forward, int64_t *level)
{
    if (forward) {
        for (int64_t i = 0; i < n; ++i) {
            int64_t lv = 0;
            for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
                int64_t j = indices[k];
                if (j < i && level[j] + 1 > lv) lv = level[j] + 1;
            }
            level[i] = lv;
        }
    } else {
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t lv = 0;
            for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
                int64_t j = indices[k];
                if (j > i && level[j] + 1 > lv) lv = level[j] + 1;
            }
            level[i] = lv;
        }
    }
}

/* Classical Ruge-Stueben first pass (par_coarsen.c:874 structure):
 * bucket queue keyed by measure = |S^T row| with the standard
 * increment/decrement updates.  cf: 1 = C, -1 = F, -3 = isolated. */
void rs_coarsen(const int64_t *S_indptr, const int64_t *S_indices,
                const int64_t *ST_indptr, const int64_t *ST_indices,
                int64_t n, int64_t *cf)
{
    int64_t *measure = (int64_t *)malloc(n * sizeof(int64_t));
    int64_t *settled = (int64_t *)calloc(n, sizeof(int64_t));

    int64_t max_measure = 0;
    for (int64_t i = 0; i < n; ++i) {
        measure[i] = ST_indptr[i + 1] - ST_indptr[i];
        cf[i] = 0;
        if (measure[i] == 0 && S_indptr[i + 1] == S_indptr[i]) {
            cf[i] = -3; /* isolated */
            settled[i] = 1;
        }
        if (measure[i] > max_measure) max_measure = measure[i];
    }

    /* bucket lists by measure (measures can grow to ~2*max) */
    int64_t nbuckets = 2 * max_measure + n + 2;
    int64_t *head = (int64_t *)malloc(nbuckets * sizeof(int64_t));
    int64_t *next = (int64_t *)malloc(n * sizeof(int64_t));
    int64_t *prev = (int64_t *)malloc(n * sizeof(int64_t));
    for (int64_t b = 0; b < nbuckets; ++b) head[b] = -1;
    for (int64_t i = 0; i < n; ++i) next[i] = prev[i] = -1;

#define BUCKET_INSERT(i)                                                  \
    do {                                                                  \
        int64_t b = measure[i];                                           \
        next[i] = head[b];                                                \
        prev[i] = -1;                                                     \
        if (head[b] >= 0) prev[head[b]] = (i);                            \
        head[b] = (i);                                                    \
    } while (0)

#define BUCKET_REMOVE(i)                                                  \
    do {                                                                  \
        if (prev[i] >= 0) next[prev[i]] = next[i];                        \
        else head[measure[i]] = next[i];                                  \
        if (next[i] >= 0) prev[next[i]] = prev[i];                        \
        next[i] = prev[i] = -1;                                           \
    } while (0)

    for (int64_t i = 0; i < n; ++i)
        if (!settled[i]) BUCKET_INSERT(i);

    int64_t cur_max = max_measure;
    for (;;) {
        while (cur_max > 0 && head[cur_max] < 0) --cur_max;
        if (cur_max <= 0) break;
        int64_t i = head[cur_max];
        BUCKET_REMOVE(i);
        cf[i] = 1;
        settled[i] = 1;
        /* points depending on i become F; their influencers gain measure */
        for (int64_t k = ST_indptr[i]; k < ST_indptr[i + 1]; ++k) {
            int64_t j = ST_indices[k];
            if (settled[j]) continue;
            BUCKET_REMOVE(j);
            cf[j] = -1;
            settled[j] = 1;
            for (int64_t kk = S_indptr[j]; kk < S_indptr[j + 1]; ++kk) {
                int64_t m = S_indices[kk];
                if (settled[m]) continue;
                BUCKET_REMOVE(m);
                measure[m] += 1;
                if (measure[m] >= nbuckets) measure[m] = nbuckets - 1;
                BUCKET_INSERT(m);
                if (measure[m] > cur_max) cur_max = measure[m];
            }
        }
        /* i's influencees lose it as a potential C neighbor */
        for (int64_t k = S_indptr[i]; k < S_indptr[i + 1]; ++k) {
            int64_t j = S_indices[k];
            if (settled[j]) continue;
            BUCKET_REMOVE(j);
            if (measure[j] > 0) measure[j] -= 1;
            BUCKET_INSERT(j);
        }
    }
    for (int64_t i = 0; i < n; ++i)
        if (!settled[i]) cf[i] = -1;

    free(measure);
    free(settled);
    free(head);
    free(next);
    free(prev);
}

/* CLJP coarsening (par_coarsen.c:93 hypre_BoomerAMGCoarsen, serial form).
 * S_indices entries are mutated (sign-encoded edge removal, the
 * reference's in-place trick).  measure holds |S^T col| + rand on entry.
 * cf: 0 unassigned -> 1 C / -1 F. */
void cljp_coarsen(const int64_t *S_indptr, int64_t *S_indices, int64_t n,
                  double *measure, int64_t *cf)
{
    const int64_t C_PT = 1, F_PT = -1, SF_PT = -3, COMMON_C = -2;
    int64_t *graph = (int64_t *)malloc(n * sizeof(int64_t));
    int64_t graph_size = n;
    for (int64_t i = 0; i < n; ++i) { graph[i] = i; cf[i] = 0; }

    for (;;) {
        /* F-assignment: measure < 1 and all row edges removed */
        for (int64_t ig = 0; ig < graph_size; ++ig) {
            int64_t i = graph[ig];
            if (cf[i] != C_PT && measure[i] < 1.0) {
                cf[i] = F_PT;
                for (int64_t p = S_indptr[i]; p < S_indptr[i + 1]; ++p)
                    if (S_indices[p] > -1) { cf[i] = 0; break; }
            }
            if (cf[i]) {
                measure[i] = 0.0;
                graph[ig] = graph[--graph_size];
                graph[graph_size] = i;
                --ig;
            }
        }
        if (graph_size == 0) break;

        /* independent set: candidates measure > 1, strict loser removal */
        for (int64_t ig = 0; ig < graph_size; ++ig) {
            int64_t i = graph[ig];
            if (measure[i] > 1.0) cf[i] = 1;
        }
        for (int64_t ig = 0; ig < graph_size; ++ig) {
            int64_t i = graph[ig];
            if (measure[i] > 1.0) {
                for (int64_t p = S_indptr[i]; p < S_indptr[i + 1]; ++p) {
                    int64_t j = S_indices[p];
                    if (j < 0) j = -j - 1;
                    if (measure[j] > 1.0) {
                        if (measure[i] > measure[j]) cf[j] = 0;
                        else if (measure[j] > measure[i]) cf[i] = 0;
                    }
                }
            }
        }

        /* C assignment + CLJP heuristics (par_coarsen.c:615-800) */
        for (int64_t ig = 0; ig < graph_size; ++ig) {
            int64_t i = graph[ig];
            if (cf[i] > 0) {
                cf[i] = C_PT;
                for (int64_t p = S_indptr[i]; p < S_indptr[i + 1]; ++p) {
                    int64_t j = S_indices[p];
                    if (j > -1) {
                        S_indices[p] = -j - 1; /* remove edge */
                        if (!cf[j]) measure[j] -= 1.0;
                    }
                }
            } else {
                /* marked dependencies */
                for (int64_t p = S_indptr[i]; p < S_indptr[i + 1]; ++p) {
                    int64_t j = S_indices[p];
                    if (j < 0) j = -j - 1;
                    if (cf[j] > 0) {
                        if (S_indices[p] > -1) S_indices[p] = -S_indices[p] - 1;
                        cf[j] = COMMON_C;
                    } else if (cf[j] == SF_PT) {
                        if (S_indices[p] > -1) S_indices[p] = -S_indices[p] - 1;
                    }
                }
                /* unmarked dependencies: common-C heuristic */
                for (int64_t p = S_indptr[i]; p < S_indptr[i + 1]; ++p) {
                    if (S_indices[p] > -1) {
                        int64_t j = S_indices[p];
                        for (int64_t q = S_indptr[j]; q < S_indptr[j + 1]; ++q) {
                            int64_t k = S_indices[q];
                            if (k < 0) k = -k - 1;
                            if (cf[k] == COMMON_C) {
                                S_indices[p] = -S_indices[p] - 1;
                                measure[j] -= 1.0;
                                break;
                            }
                        }
                    }
                }
                /* reset temporary markers */
                for (int64_t p = S_indptr[i]; p < S_indptr[i + 1]; ++p) {
                    int64_t j = S_indices[p];
                    if (j < 0) j = -j - 1;
                    if (cf[j] == COMMON_C) cf[j] = C_PT;
                }
            }
        }
    }
    free(graph);
}

/* Extended+i interpolation fill (par_lr_interp.c:1041-1860, serial).
 * Inputs: CSR of A (sorted), CSR pattern of S (sorted), cf markers
 * (>=0 C, -1 F, -3 SF).  Outputs to preallocated COO arrays; returns
 * nnz(P) (caller re-runs with a larger cap if exceeded). */
int64_t ext_pi_interp(const int64_t *A_indptr, const int64_t *A_indices,
                      const double *A_data, const int64_t *S_indptr,
                      const int64_t *S_indices, const int64_t *cf,
                      int64_t n, int64_t *out_rows, int64_t *out_cols,
                      double *out_vals, int64_t cap)
{
    int64_t *cmap = (int64_t *)malloc(n * sizeof(int64_t));
    int64_t nc = 0;
    for (int64_t i = 0; i < n; ++i) cmap[i] = (cf[i] >= 0) ? nc++ : -1;

    /* marker[x]: -1 untouched; >=0 slot in (cols,w); -9 strong-F of row */
    int64_t *marker = (int64_t *)malloc(n * sizeof(int64_t));
    for (int64_t x = 0; x < n; ++x) marker[x] = -1;
    int64_t *cols = (int64_t *)malloc(n * sizeof(int64_t));
    double *w = (double *)malloc(n * sizeof(double));
    int64_t *ftouch = (int64_t *)malloc(n * sizeof(int64_t));

    int64_t nnz = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (cf[i] >= 0) {
            if (nnz < cap) {
                out_rows[nnz] = i; out_cols[nnz] = cmap[i]; out_vals[nnz] = 1.0;
            }
            ++nnz;
            continue;
        }
        if (cf[i] == -3) continue;

        int64_t nw = 0, nf = 0;
        /* pass 1: build C_i^ext (strong C of i, plus strong C of each
           strong-F neighbor), interleaved in row order like the
           reference count/fill loops */
        for (int64_t p = S_indptr[i]; p < S_indptr[i + 1]; ++p) {
            int64_t j = S_indices[p];
            if (cf[j] >= 0) {
                if (marker[j] == -1) { marker[j] = nw; cols[nw] = j; w[nw++] = 0.0; }
            } else if (cf[j] == -1) {
                if (marker[j] == -1) { marker[j] = -9; ftouch[nf++] = j; }
                for (int64_t q = S_indptr[j]; q < S_indptr[j + 1]; ++q) {
                    int64_t k = S_indices[q];
                    if (cf[k] >= 0 && marker[k] == -1) {
                        marker[k] = nw; cols[nw] = k; w[nw++] = 0.0;
                    }
                }
            }
        }
        double diag = 0.0;
        /* pass 2: accumulate over A row i (par_lr_interp.c:1663-1731) */
        for (int64_t p = A_indptr[i]; p < A_indptr[i + 1]; ++p) {
            int64_t j = A_indices[p];
            double a = A_data[p];
            if (j == i) { diag += a; continue; }
            if (marker[j] >= 0) {
                w[marker[j]] += a;
            } else if (marker[j] == -9) {
                double akk = 0.0;
                for (int64_t q = A_indptr[j]; q < A_indptr[j + 1]; ++q)
                    if (A_indices[q] == j) { akk = A_data[q]; break; }
                double sgn = (akk < 0) ? -1.0 : 1.0;
                double sum = 0.0;
                for (int64_t q = A_indptr[j]; q < A_indptr[j + 1]; ++q) {
                    int64_t m = A_indices[q];
                    if (m == j) continue;
                    if (sgn * A_data[q] < 0 && (marker[m] >= 0 || m == i))
                        sum += A_data[q];
                }
                if (sum != 0.0) {
                    double dist = a / sum;
                    for (int64_t q = A_indptr[j]; q < A_indptr[j + 1]; ++q) {
                        int64_t m = A_indices[q];
                        if (m == j) continue;
                        if (sgn * A_data[q] < 0) {
                            if (marker[m] >= 0) w[marker[m]] += dist * A_data[q];
                            if (m == i) diag += dist * A_data[q];
                        }
                    }
                } else {
                    diag += a;
                }
            } else if (cf[j] != -3) {
                diag += a;
            }
        }
        if (diag != 0.0) {
            for (int64_t k = 0; k < nw; ++k) {
                double v = -w[k] / diag;
                if (v != 0.0) {
                    if (nnz < cap) {
                        out_rows[nnz] = i;
                        out_cols[nnz] = cmap[cols[k]];
                        out_vals[nnz] = v;
                    }
                    ++nnz;
                }
            }
        }
        for (int64_t k = 0; k < nw; ++k) marker[cols[k]] = -1;
        for (int64_t k = 0; k < nf; ++k) marker[ftouch[k]] = -1;
    }
    free(cmap); free(marker); free(cols); free(w); free(ftouch);
    return nnz;
}

/* hypre's exact interpolation-truncation tie order: middle-pivot
 * quicksort, descending by |w|, strict comparison
 * (utilities/hypre_qsort.c hypre_qsort2_abs:367; used by
 * hypre_ParCSRMatrixTruncate par_csr_matrix.c).  Ties keep hypre's
 * partition order, which a stable argsort does NOT reproduce. */
static void qsort2_abs(int64_t *v, double *w, int64_t left, int64_t right)
{
    if (left >= right) return;
    int64_t mid = (left + right) / 2;
    int64_t tv = v[left]; v[left] = v[mid]; v[mid] = tv;
    double tw = w[left]; w[left] = w[mid]; w[mid] = tw;
    int64_t last = left;
    double pa = w[left] < 0 ? -w[left] : w[left];
    for (int64_t i = left + 1; i <= right; ++i) {
        double ai = w[i] < 0 ? -w[i] : w[i];
        if (ai > pa) {
            ++last;
            tv = v[last]; v[last] = v[i]; v[i] = tv;
            tw = w[last]; w[last] = w[i]; w[i] = tw;
        }
    }
    tv = v[left]; v[left] = v[last]; v[last] = tv;
    tw = w[left]; w[left] = w[last]; w[last] = tw;
    qsort2_abs(v, w, left, last - 1);
    qsort2_abs(v, w, last + 1, right);
}

void trunc_keep(const int64_t *indptr, const int64_t *cols,
                const double *vals, int64_t n, int64_t max_elmts,
                uint8_t *keep)
{
    int64_t cap = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t len = indptr[i + 1] - indptr[i];
        if (len > cap) cap = len;
    }
    int64_t *cbuf = (int64_t *)malloc(cap * sizeof(int64_t));
    double *vbuf = (double *)malloc(cap * sizeof(double));
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = indptr[i], e = indptr[i + 1], len = e - s;
        if (len <= max_elmts) {
            for (int64_t j = s; j < e; ++j) keep[j] = 1;
            continue;
        }
        for (int64_t j = 0; j < len; ++j) { cbuf[j] = cols[s + j]; vbuf[j] = vals[s + j]; }
        qsort2_abs(cbuf, vbuf, 0, len - 1);
        for (int64_t j = s; j < e; ++j) keep[j] = 0;
        for (int64_t k = 0; k < max_elmts; ++k) {
            int64_t c = cbuf[k];
            for (int64_t j = s; j < e; ++j) {
                if (cols[j] == c && !keep[j]) { keep[j] = 1; break; }
            }
        }
    }
    free(cbuf);
    free(vbuf);
}
