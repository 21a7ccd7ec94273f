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

namespace {

// Indexed binary min-heap over cluster slots, keyed by an external double
// array (the nn_dist lower bounds). Supports O(log n) key updates in either
// direction and O(log n) removal — the Muellner generic-algorithm queue.
struct SlotHeap {
  std::vector<long> heap;  // heap[k] = slot
  std::vector<long> pos;   // pos[slot] = k, or -1 if removed
  const double* key;

  SlotHeap(long n, const double* k) : heap(n), pos(n), key(k) {
    for (long i = 0; i < n; ++i) heap[i] = pos[i] = i;
    for (long i = n / 2 - 1; i >= 0; --i) sift_down(i);
  }
  long top() const { return heap[0]; }
  void sift_up(long k) {
    long s = heap[k];
    while (k > 0) {
      long p = (k - 1) / 2;
      if (key[heap[p]] <= key[s]) break;
      heap[k] = heap[p];
      pos[heap[k]] = k;
      k = p;
    }
    heap[k] = s;
    pos[s] = k;
  }
  void sift_down(long k) {
    long s = heap[k];
    const long sz = static_cast<long>(heap.size());
    for (;;) {
      long c = 2 * k + 1;
      if (c >= sz) break;
      if (c + 1 < sz && key[heap[c + 1]] < key[heap[c]]) ++c;
      if (key[heap[c]] >= key[s]) break;
      heap[k] = heap[c];
      pos[heap[k]] = k;
      k = c;
    }
    heap[k] = s;
    pos[s] = k;
  }
  void update(long slot) {  // key[slot] changed in either direction
    long k = pos[slot];
    sift_up(k);
    if (pos[slot] == k) sift_down(k);
  }
  void remove(long slot) {
    long k = pos[slot];
    pos[slot] = -1;
    long last = heap.back();
    heap.pop_back();
    if (k < static_cast<long>(heap.size())) {
      heap[k] = last;
      pos[last] = k;
      sift_up(k);
      if (pos[last] == k) sift_down(k);
    }
  }
};

}  // namespace

extern "C" fc_error fastcluster_centroid_linkage_lw(double* sqdist, long n,
                                                    double* dendrogram_out) {
  if (sqdist == nullptr || dendrogram_out == nullptr || n < 2)
    return FC_ERR_INVALID_ARG;
  for (long i = 0; i < n * n; ++i)
    if (!std::isfinite(sqdist[i])) return FC_ERR_NAN;

  try {
    const double kInf = std::numeric_limits<double>::infinity();
    auto D = [&](long i, long j) -> double& { return sqdist[i * n + j]; };
    std::vector<long> size(static_cast<size_t>(n), 1);
    std::vector<long> id(static_cast<size_t>(n));
    std::vector<char> active(static_cast<size_t>(n), 1);
    for (long i = 0; i < n; ++i) id[i] = i;
    for (long i = 0; i < n; ++i) D(i, i) = kInf;

    // Muellner generic algorithm: nn[i] is i's candidate nearest neighbor
    // restricted to slots j > i (the pair min is still found because the
    // SMALLER slot of the true closest pair owns it), and nn_dist[i] is a
    // LOWER BOUND on min_{j>i active} D(i,j): distances to untouched
    // clusters never change, a merged cluster that comes closer updates the
    // bound explicitly in the merge loop, and removals only raise the true
    // min. Merging into the LARGER slot keeps every j > b candidate set
    // stale-free (the merged cluster is not in it), so only j < b rows need
    // bound maintenance. A slot heap keyed by the bounds replaces the O(n)
    // min scan per step.
    std::vector<long> nn(static_cast<size_t>(n), -1);
    std::vector<double> nn_dist(static_cast<size_t>(n), kInf);
    auto rescan_upper = [&](long i) {
      long arg = -1;
      double best = kInf;
      const double* row = sqdist + i * n;
      for (long j = i + 1; j < n; ++j) {
        if (!active[j]) continue;
        if (row[j] < best) {
          best = row[j];
          arg = j;
        }
      }
      nn[i] = arg;
      nn_dist[i] = best;
    };
    for (long i = 0; i < n; ++i) rescan_upper(i);
    SlotHeap heap(n, nn_dist.data());

    long next_id = n;
    for (long step = 0; step < n - 1; ++step) {
      // validate only the heap top: a popped bound is exact iff its cached
      // candidate is live and the matrix still agrees (equality with a
      // different live pair at the same value is still a correct min-merge)
      long a;
      for (;;) {
        a = heap.top();
        long c = nn[a];
        if (c >= 0 && active[c] && D(a, c) == nn_dist[a]) break;
        rescan_upper(a);  // exact value >= the stale lower bound
        heap.update(a);
      }
      const long b = nn[a];  // b > a by construction
      const double best = nn_dist[a];

      long id_a = id[a], id_b = id[b];
      if (id_a > id_b) std::swap(id_a, id_b);
      const double na = static_cast<double>(size[a]);
      const double nb = static_cast<double>(size[b]);
      const double nt = na + nb;
      dendrogram_out[step * 4 + 0] = static_cast<double>(id_a);
      dendrogram_out[step * 4 + 1] = static_cast<double>(id_b);
      dendrogram_out[step * 4 + 2] = std::sqrt(std::max(best, 0.0));
      dendrogram_out[step * 4 + 3] = nt;

      active[a] = 0;
      heap.remove(a);

      // Lance-Williams centroid update into slot b (the larger), O(n)/merge
      const double dab = best;
      const double wa = na / nt, wb = nb / nt, wc = -(na * nb) / (nt * nt);
      const double* row_a = sqdist + a * n;
      const double* row_b = sqdist + b * n;
      for (long j = 0; j < b; ++j) {
        if (j == a || !active[j]) continue;
        double dd = wa * row_a[j] + wb * row_b[j] + wc * dab;
        dd = std::max(dd, 0.0);
        D(b, j) = D(j, b) = dd;
        // centroid linkage is non-reducible: the merged cluster may now be
        // closer to j than j's (lower-bound) cached candidate
        if (dd < nn_dist[j]) {
          nn_dist[j] = dd;
          nn[j] = b;
          heap.update(j);
        }
      }
      for (long j = b + 1; j < n; ++j) {
        if (!active[j]) continue;
        double dd = wa * row_a[j] + wb * row_b[j] + wc * dab;
        D(b, j) = D(j, b) = std::max(dd, 0.0);
        // j's candidates all exceed j > b: nothing to maintain
      }
      size[b] = static_cast<long>(nt);
      id[b] = next_id++;
      rescan_upper(b);
      heap.update(b);
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
