// Centroid-linkage AHC: fresh O(n^2)-memory implementation with per-cluster
// nearest-neighbor caching and lazy invalidation. See fastcluster.h.
#include "fastcluster.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <functional>
#include <limits>
#include <new>
#include <vector>

namespace {

inline double sq(double x) { return x * x; }

struct Cluster {
  std::vector<double> centroid;
  long size = 0;
  long id = -1;  // scipy cluster id
  bool active = false;
};

}  // namespace

extern "C" fc_error fastcluster_compute_centroid_linkage(
    const double* points, long n, long d, double* dendrogram_out) {
  if (points == nullptr || dendrogram_out == nullptr || n < 2 || d < 1)
    return FC_ERR_INVALID_ARG;
  if (n > 100000) return FC_ERR_OVERFLOW;  // n^2 doubles would exceed sane memory

  for (long i = 0; i < n * d; ++i)
    if (!std::isfinite(points[i])) return FC_ERR_NAN;

  try {
    std::vector<Cluster> clusters(static_cast<size_t>(n));
    for (long i = 0; i < n; ++i) {
      clusters[i].centroid.assign(points + i * d, points + (i + 1) * d);
      clusters[i].size = 1;
      clusters[i].id = i;
      clusters[i].active = true;
    }

    // full distance matrix between active clusters (centroid euclidean)
    std::vector<double> dist(static_cast<size_t>(n) * n,
                             std::numeric_limits<double>::infinity());
    auto D = [&](long i, long j) -> double& { return dist[i * n + j]; };
    for (long i = 0; i < n; ++i) {
      for (long j = i + 1; j < n; ++j) {
        double s = 0;
        for (long k = 0; k < d; ++k) s += sq(points[i * d + k] - points[j * d + k]);
        D(i, j) = D(j, i) = std::sqrt(s);
      }
    }

    // per-cluster nearest active neighbor (index into slot array) + its dist
    std::vector<long> nn(static_cast<size_t>(n), -1);
    std::vector<double> nn_dist(static_cast<size_t>(n),
                                std::numeric_limits<double>::infinity());
    auto rescan = [&](long i) {
      nn[i] = -1;
      nn_dist[i] = std::numeric_limits<double>::infinity();
      for (long j = 0; j < n; ++j) {
        if (j == i || !clusters[j].active) continue;
        if (D(i, j) < nn_dist[i]) {
          nn_dist[i] = D(i, j);
          nn[i] = j;
        }
      }
    };
    for (long i = 0; i < n; ++i) rescan(i);

    long next_id = n;
    for (long step = 0; step < n - 1; ++step) {
      // find global minimum over cached NNs (rescan stale entries lazily)
      long best_i = -1;
      double best = std::numeric_limits<double>::infinity();
      for (long i = 0; i < n; ++i) {
        if (!clusters[i].active) continue;
        if (nn[i] < 0 || !clusters[nn[i]].active) rescan(i);
        if (nn[i] >= 0 && nn_dist[i] < best) {
          best = nn_dist[i];
          best_i = i;
        }
      }
      if (best_i < 0) return FC_ERR_INVALID_ARG;  // unreachable
      long a = best_i, b = nn[best_i];

      // scipy row: smaller id first
      long id_a = clusters[a].id, id_b = clusters[b].id;
      if (id_a > id_b) std::swap(id_a, id_b);
      long new_size = clusters[a].size + clusters[b].size;
      dendrogram_out[step * 4 + 0] = static_cast<double>(id_a);
      dendrogram_out[step * 4 + 1] = static_cast<double>(id_b);
      dendrogram_out[step * 4 + 2] = best;
      dendrogram_out[step * 4 + 3] = static_cast<double>(new_size);

      // merge b into a's slot: weighted centroid
      const double wa = static_cast<double>(clusters[a].size) / new_size;
      const double wb = static_cast<double>(clusters[b].size) / new_size;
      for (long k = 0; k < d; ++k)
        clusters[a].centroid[k] =
            wa * clusters[a].centroid[k] + wb * clusters[b].centroid[k];
      clusters[a].size = new_size;
      clusters[a].id = next_id++;
      clusters[b].active = false;

      // refresh distances from the merged cluster to all active others
      for (long j = 0; j < n; ++j) {
        if (j == a || !clusters[j].active) continue;
        double s = 0;
        for (long k = 0; k < d; ++k)
          s += sq(clusters[a].centroid[k] - clusters[j].centroid[k]);
        double dd = std::sqrt(s);
        D(a, j) = D(j, a) = dd;
        // centroid linkage is non-reducible: the merged cluster may now be
        // closer to j than j's cached NN was
        if (dd < nn_dist[j]) {
          nn_dist[j] = dd;
          nn[j] = a;
        } else if (nn[j] == a || nn[j] == b) {
          nn[j] = -1;  // stale; lazy rescan next round
        }
      }
      rescan(a);
    }
    return FC_OK;
  } catch (const std::bad_alloc&) {
    return FC_ERR_ALLOC;
  }
}

extern "C" fc_error fastcluster_centroid_linkage_lw(double* sqdist, long n,
                                                    double* dendrogram_out) {
  if (sqdist == nullptr || dendrogram_out == nullptr || n < 2)
    return FC_ERR_INVALID_ARG;
  for (long i = 0; i < n * n; ++i)
    if (!std::isfinite(sqdist[i])) return FC_ERR_NAN;

  try {
    auto D = [&](long i, long j) -> double& { return sqdist[i * n + j]; };
    std::vector<long> size(static_cast<size_t>(n), 1);
    std::vector<long> id(static_cast<size_t>(n));
    std::vector<char> active(static_cast<size_t>(n), 1);
    for (long i = 0; i < n; ++i) id[i] = i;
    for (long i = 0; i < n; ++i) D(i, i) = std::numeric_limits<double>::infinity();

    std::vector<long> nn(static_cast<size_t>(n), -1);
    std::vector<double> nn_dist(static_cast<size_t>(n),
                                std::numeric_limits<double>::infinity());
    auto rescan = [&](long i) {
      nn[i] = -1;
      nn_dist[i] = std::numeric_limits<double>::infinity();
      const double* row = sqdist + i * n;
      for (long j = 0; j < n; ++j) {
        if (j == i || !active[j]) continue;
        if (row[j] < nn_dist[i]) {
          nn_dist[i] = row[j];
          nn[i] = j;
        }
      }
    };
    for (long i = 0; i < n; ++i) rescan(i);

    long next_id = n;
    for (long step = 0; step < n - 1; ++step) {
      // Muellner generic-algorithm invariant: a stale nn_dist[i] (cached NN
      // merged away) is a LOWER BOUND on i's true min distance — distances
      // to untouched clusters never change and any merged cluster that came
      // closer already updated the cache in the merge loop below. So pick
      // the global min of the bounds and validate only that one row,
      // instead of eagerly rescanning every stale cluster per step
      // (which degenerates to O(n^2) rescans/step on blobby data).
      long a = -1;
      for (;;) {
        long best_i = -1;
        double best_lb = std::numeric_limits<double>::infinity();
        for (long i = 0; i < n; ++i) {
          if (!active[i]) continue;
          if (nn_dist[i] < best_lb) {
            best_lb = nn_dist[i];
            best_i = i;
          }
        }
        if (best_i < 0) return FC_ERR_INVALID_ARG;  // unreachable
        if (nn[best_i] >= 0 && active[nn[best_i]]) {
          a = best_i;
          break;
        }
        rescan(best_i);  // true value >= its lower bound
      }
      double best = nn_dist[a];
      long b = nn[a];

      long id_a = id[a], id_b = id[b];
      if (id_a > id_b) std::swap(id_a, id_b);
      const double na = static_cast<double>(size[a]);
      const double nb = static_cast<double>(size[b]);
      const double nt = na + nb;
      dendrogram_out[step * 4 + 0] = static_cast<double>(id_a);
      dendrogram_out[step * 4 + 1] = static_cast<double>(id_b);
      dendrogram_out[step * 4 + 2] = std::sqrt(std::max(best, 0.0));
      dendrogram_out[step * 4 + 3] = nt;

      // Lance-Williams centroid update into a's slot, O(n) per merge
      const double dab = best;
      const double wa = na / nt, wb = nb / nt, wc = -(na * nb) / (nt * nt);
      for (long j = 0; j < n; ++j) {
        if (j == a || j == b || !active[j]) continue;
        double dd = wa * D(a, j) + wb * D(b, j) + wc * dab;
        dd = std::max(dd, 0.0);
        D(a, j) = D(j, a) = dd;
        // centroid linkage is non-reducible: the merged cluster may now be
        // closer to j than j's cached NN was
        if (dd < nn_dist[j]) {
          nn_dist[j] = dd;
          nn[j] = a;
        } else if (nn[j] == a || nn[j] == b) {
          nn[j] = -1;  // stale; lazy rescan next round
        }
      }
      size[a] = static_cast<long>(nt);
      id[a] = next_id++;
      active[b] = 0;
      rescan(a);
    }
    return FC_OK;
  } catch (const std::bad_alloc&) {
    return FC_ERR_ALLOC;
  }
}

extern "C" long fastcluster_cut_tree(const double* dendrogram, long n,
                                     double threshold, long* labels_out) {
  if (dendrogram == nullptr || labels_out == nullptr || n < 1)
    return -static_cast<long>(FC_ERR_INVALID_ARG);
  try {
    // union-find over 2n-1 nodes, union rows with dist <= threshold
    std::vector<long> parent(static_cast<size_t>(2 * n - 1));
    for (long i = 0; i < 2 * n - 1; ++i) parent[i] = i;
    std::function<long(long)> find = [&](long x) {
      while (parent[x] != x) {
        parent[x] = parent[parent[x]];
        x = parent[x];
      }
      return x;
    };
    for (long step = 0; step < n - 1; ++step) {
      if (dendrogram[step * 4 + 2] > threshold) continue;
      long a = static_cast<long>(dendrogram[step * 4 + 0]);
      long b = static_cast<long>(dendrogram[step * 4 + 1]);
      long merged = n + step;
      parent[find(a)] = find(merged);
      parent[find(b)] = find(merged);
    }
    std::vector<long> remap(static_cast<size_t>(2 * n - 1), -1);
    long next = 0;
    for (long i = 0; i < n; ++i) {
      long root = find(i);
      if (remap[root] < 0) remap[root] = next++;
      labels_out[i] = remap[root];
    }
    return next;
  } catch (const std::bad_alloc&) {
    return -static_cast<long>(FC_ERR_ALLOC);
  }
}

extern "C" const char* fastcluster_version(void) { return "fluidaudio-fc 1.0"; }
