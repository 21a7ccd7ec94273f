/* Centroid-linkage agglomerative hierarchical clustering, C ABI.
 *
 * TPU-framework native equivalent of the reference's FastClusterWrapper
 * (FastClusterWrapper/include/FastClusterWrapper.h:11-42): row-major f64
 * point matrix in -> SciPy-format dendrogram (n-1)x4 out, with an error enum
 * for overflow/alloc/NaN. Fresh implementation (generic nearest-neighbor
 * agglomeration with lazy NN invalidation), not a port of Muellner's code.
 */
#ifndef FLUIDAUDIO_FASTCLUSTER_H
#define FLUIDAUDIO_FASTCLUSTER_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
  FC_OK = 0,
  FC_ERR_INVALID_ARG = 1,
  FC_ERR_ALLOC = 2,
  FC_ERR_NAN = 3,
  FC_ERR_OVERFLOW = 4,
} fc_error;

/* points: n x d row-major float64.
 * dendrogram_out: (n-1) x 4 row-major float64
 *   [cluster_id_a, cluster_id_b, centroid_distance, merged_size]
 *   with original points 0..n-1 and merged clusters n..2n-2 (SciPy format).
 */
fc_error fastcluster_compute_centroid_linkage(
    const double* points, long n, long d, double* dendrogram_out);

/* Same output, but from a precomputed SQUARED euclidean distance matrix
 * (n x n row-major f64, modified in place). Centroid merges use the
 * Lance-Williams recurrence — O(n) per merge instead of O(n*d) — so the
 * caller can build the initial matrix with one BLAS gemm and hour-scale
 * diarization (n in the thousands) clusters in O(n^2) total:
 *   d2(a+b, j) = (na*d2(a,j) + nb*d2(b,j))/(na+nb)
 *              - na*nb*d2(a,b)/(na+nb)^2
 * Identical mathematics to explicit centroid recomputation (and to SciPy's
 * own centroid implementation). */
fc_error fastcluster_centroid_linkage_lw(
    double* sqdist, long n, double* dendrogram_out);

/* Cut a dendrogram at `threshold` (inclusive): flat cluster label per point,
 * labels 0..k-1 in order of first appearance. Returns k or negative error. */
long fastcluster_cut_tree(
    const double* dendrogram, long n, double threshold, long* labels_out);

const char* fastcluster_version(void);

#ifdef __cplusplus
}
#endif

#endif /* FLUIDAUDIO_FASTCLUSTER_H */
