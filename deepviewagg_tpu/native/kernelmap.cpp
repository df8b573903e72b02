// Host-side voxel hashing + kernel-map construction (C++ extension).
//
// The native replacement for the role torchsparse's sphash/sphashquery
// C++/CUDA kernels play in the reference (modules/SparseConv3d/nn/
// torchsparse.py; modules/multimodal/modules.py:194-211): build the dense
// neighbor tables the TPU gather-GEMM sparse conv consumes.  This runs on
// the host at collate time — the hot CPU path of the input pipeline — so it
// is an open-addressing hash table (O(N + K*M)) instead of numpy's
// per-offset sort+searchsorted (O(K*M log N)).
//
// Key packing matches deepviewagg_tpu/ops/voxel.py exactly: 19 bits per
// spatial axis (bias 2^18), batch in the top bits — identical int64 keys,
// identical sorted-unique ordering, so the numpy path is a drop-in fallback.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <utility>
#include <vector>

namespace {

constexpr int SHIFT = 19;
constexpr int64_t BIAS = 1 << (SHIFT - 1);

inline int64_t pack(const int32_t* row) {
  int64_t key = row[0];
  for (int i = 1; i < 4; ++i) key = (key << SHIFT) | (row[i] + BIAS);
  return key;
}

// Mirror ops/voxel.py ravel_coords' asserts: out-of-range coordinates would
// silently corrupt packed keys and yield wrong neighbor tables (and the
// python-side asserts vanish under `python -O`), so validate here too.
constexpr int32_t MAX_COORD = (int32_t)(BIAS - 1);
constexpr int64_t MAX_BATCH = (int64_t)1 << (63 - 3 * SHIFT);

bool check_coord_range(const int32_t* c, npy_intp n, const char* what) {
  for (npy_intp i = 0; i < n; ++i) {
    const int32_t* row = c + 4 * i;
    if (row[0] < 0 || (int64_t)row[0] >= MAX_BATCH ||
        std::abs(row[1]) > MAX_COORD || std::abs(row[2]) > MAX_COORD ||
        std::abs(row[3]) > MAX_COORD) {
      PyErr_Format(PyExc_ValueError,
                   "%s row %ld out of 19-bit key range "
                   "(batch %d, coords %d %d %d)",
                   what, (long)i, row[0], row[1], row[2], row[3]);
      return false;
    }
  }
  return true;
}

// open-addressing hash table: int64 key -> int32 value
struct HashTable {
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit HashTable(size_t n) {
    size_t cap = 16;
    while (cap < 2 * n + 1) cap <<= 1;
    keys.assign(cap, -1);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  static inline uint64_t mix(int64_t k) {
    uint64_t h = (uint64_t)k;
    h ^= h >> 33;
    h *= 0xff51afd7ed558ccdULL;
    h ^= h >> 33;
    h *= 0xc4ceb9fe1a85ec53ULL;
    h ^= h >> 33;
    return h;
  }

  inline void insert(int64_t key, int32_t val) {
    uint64_t i = mix(key) & mask;
    while (keys[i] != -1 && keys[i] != key) i = (i + 1) & mask;
    if (keys[i] == -1) {
      keys[i] = key;
      vals[i] = val;
    }
    // duplicate keys keep the first value (coords are unique by contract)
  }

  inline int32_t find(int64_t key) const {
    uint64_t i = mix(key) & mask;
    while (keys[i] != -1) {
      if (keys[i] == key) return vals[i];
      i = (i + 1) & mask;
    }
    return -1;
  }
};

PyArrayObject* as_int32_2d(PyObject* obj, const char* name) {
  PyArrayObject* arr = (PyArrayObject*)PyArray_FROM_OTF(
      obj, NPY_INT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != 2 || PyArray_DIM(arr, 1) != 4) {
    PyErr_Format(PyExc_ValueError, "%s must be int32 [N, 4]", name);
    Py_DECREF(arr);
    return nullptr;
  }
  return arr;
}

// build_kernel_map(in_coords [N,4], out_coords [M,4], offsets [K,3], stride,
//                  cap_in=-1, cap_out=-1)
//   -> nbr int32 [K, cap_out] with pad = cap_in (defaults N / M: unpadded).
// Writing straight into the padded capacity avoids the 2x full-size copies
// a python-side re-pad would cost on the per-batch collate path.
PyObject* build_kernel_map(PyObject*, PyObject* args) {
  PyObject *in_obj, *out_obj, *off_obj;
  long stride, cap_in = -1, cap_out = -1;
  if (!PyArg_ParseTuple(args, "OOOl|ll", &in_obj, &out_obj, &off_obj, &stride,
                        &cap_in, &cap_out))
    return nullptr;
  PyArrayObject* in_arr = as_int32_2d(in_obj, "in_coords");
  if (!in_arr) return nullptr;
  PyArrayObject* out_arr = as_int32_2d(out_obj, "out_coords");
  if (!out_arr) {
    Py_DECREF(in_arr);
    return nullptr;
  }
  PyArrayObject* off_arr = (PyArrayObject*)PyArray_FROM_OTF(
      off_obj, NPY_INT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!off_arr || PyArray_NDIM(off_arr) != 2 || PyArray_DIM(off_arr, 1) != 3) {
    PyErr_SetString(PyExc_ValueError, "offsets must be int32 [K, 3]");
    Py_XDECREF(off_arr);
    Py_DECREF(in_arr);
    Py_DECREF(out_arr);
    return nullptr;
  }

  npy_intp n = PyArray_DIM(in_arr, 0);
  npy_intp m = PyArray_DIM(out_arr, 0);
  npy_intp k = PyArray_DIM(off_arr, 0);
  if (!check_coord_range((const int32_t*)PyArray_DATA(in_arr), n,
                         "in_coords") ||
      !check_coord_range((const int32_t*)PyArray_DATA(out_arr), m,
                         "out_coords")) {
    Py_DECREF(in_arr);
    Py_DECREF(out_arr);
    Py_DECREF(off_arr);
    return nullptr;
  }
  if (cap_in < 0) cap_in = n;
  if (cap_out < 0) cap_out = m;
  if (cap_in < n || cap_out < m) {
    PyErr_SetString(PyExc_ValueError, "capacity below row count");
    Py_DECREF(in_arr);
    Py_DECREF(out_arr);
    Py_DECREF(off_arr);
    return nullptr;
  }
  npy_intp dims[2] = {k, cap_out};
  PyArrayObject* nbr =
      (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_INT32);
  if (!nbr) {
    Py_DECREF(in_arr);
    Py_DECREF(out_arr);
    Py_DECREF(off_arr);
    return nullptr;
  }

  const int32_t* in_c = (const int32_t*)PyArray_DATA(in_arr);
  const int32_t* out_c = (const int32_t*)PyArray_DATA(out_arr);
  const int32_t* offs = (const int32_t*)PyArray_DATA(off_arr);
  int32_t* nbr_d = (int32_t*)PyArray_DATA(nbr);
  const int32_t pad = (int32_t)cap_in;

  Py_BEGIN_ALLOW_THREADS;
  HashTable table((size_t)n);
  for (npy_intp i = 0; i < n; ++i) table.insert(pack(in_c + 4 * i), (int32_t)i);
  auto probe_rows = [&](npy_intp k_lo, npy_intp k_hi) {
    // table is read-only here: rows are probed concurrently across threads
    for (npy_intp kk = k_lo; kk < k_hi; ++kk) {
      const int32_t ox = offs[3 * kk] * (int32_t)stride;
      const int32_t oy = offs[3 * kk + 1] * (int32_t)stride;
      const int32_t oz = offs[3 * kk + 2] * (int32_t)stride;
      int32_t* row = nbr_d + kk * cap_out;
      for (npy_intp o = 0; o < m; ++o) {
        const int32_t* oc = out_c + 4 * o;
        int32_t q[4] = {oc[0], oc[1] + ox, oc[2] + oy, oc[3] + oz};
        int32_t hit = table.find(pack(q));
        row[o] = hit >= 0 ? hit : pad;
      }
      for (npy_intp o = m; o < cap_out; ++o) row[o] = pad;
    }
  };
  const size_t hw = std::max(1u, std::thread::hardware_concurrency());
  const npy_intp n_threads =
      (npy_intp)std::min<size_t>({hw, (size_t)k, 16});
  if (n_threads <= 1 || (int64_t)k * m < (1 << 18)) {
    probe_rows(0, k);
  } else {
    std::vector<std::thread> pool;
    npy_intp chunk = (k + n_threads - 1) / n_threads;
    for (npy_intp t = 0; t < n_threads; ++t) {
      npy_intp lo = t * chunk, hi = std::min<npy_intp>(k, lo + chunk);
      if (lo < hi) pool.emplace_back(probe_rows, lo, hi);
    }
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS;

  Py_DECREF(in_arr);
  Py_DECREF(out_arr);
  Py_DECREF(off_arr);
  return (PyObject*)nbr;
}

// unique_inverse(coords [N,4]) -> (unique [M,4] in ascending key order,
//                                  inverse int32 [N])
PyObject* unique_inverse(PyObject*, PyObject* args) {
  PyObject* obj;
  if (!PyArg_ParseTuple(args, "O", &obj)) return nullptr;
  PyArrayObject* arr = as_int32_2d(obj, "coords");
  if (!arr) return nullptr;
  npy_intp n = PyArray_DIM(arr, 0);
  const int32_t* c = (const int32_t*)PyArray_DATA(arr);
  if (!check_coord_range(c, n, "coords")) {
    Py_DECREF(arr);
    return nullptr;
  }

  std::vector<int64_t> keys((size_t)n);
  std::vector<int32_t> order((size_t)n);
  npy_intp m = 0;
  std::vector<int32_t> inverse((size_t)n);
  std::vector<int32_t> rep;

  Py_BEGIN_ALLOW_THREADS;
  for (npy_intp i = 0; i < n; ++i) {
    keys[i] = pack(c + 4 * i);
    order[i] = (int32_t)i;
  }
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return keys[a] < keys[b]; });
  int64_t prev = INT64_MIN;
  for (npy_intp i = 0; i < n; ++i) {
    int32_t idx = order[i];
    if (keys[idx] != prev) {
      prev = keys[idx];
      rep.push_back(idx);  // first occurrence in key order
      ++m;
    }
    inverse[idx] = (int32_t)(m - 1);
  }
  Py_END_ALLOW_THREADS;

  npy_intp udims[2] = {m, 4};
  PyArrayObject* uniq = (PyArrayObject*)PyArray_SimpleNew(2, udims, NPY_INT32);
  npy_intp idims[1] = {n};
  PyArrayObject* inv = (PyArrayObject*)PyArray_SimpleNew(1, idims, NPY_INT32);
  if (!uniq || !inv) {
    Py_XDECREF(uniq);
    Py_XDECREF(inv);
    Py_DECREF(arr);
    return nullptr;
  }
  int32_t* ud = (int32_t*)PyArray_DATA(uniq);
  for (npy_intp i = 0; i < m; ++i)
    std::memcpy(ud + 4 * i, c + 4 * rep[i], 4 * sizeof(int32_t));
  std::memcpy(PyArray_DATA(inv), inverse.data(), (size_t)n * sizeof(int32_t));
  Py_DECREF(arr);
  return Py_BuildValue("(NN)", uniq, inv);
}

// query(table_coords [N,4] unique, queries [M,4]) -> int32 [M] (or -1)
PyObject* query_coords(PyObject*, PyObject* args) {
  PyObject *tab_obj, *q_obj;
  if (!PyArg_ParseTuple(args, "OO", &tab_obj, &q_obj)) return nullptr;
  PyArrayObject* tab = as_int32_2d(tab_obj, "table");
  if (!tab) return nullptr;
  PyArrayObject* q = as_int32_2d(q_obj, "queries");
  if (!q) {
    Py_DECREF(tab);
    return nullptr;
  }
  npy_intp n = PyArray_DIM(tab, 0), m = PyArray_DIM(q, 0);
  if (!check_coord_range((const int32_t*)PyArray_DATA(tab), n, "table") ||
      !check_coord_range((const int32_t*)PyArray_DATA(q), m, "queries")) {
    Py_DECREF(tab);
    Py_DECREF(q);
    return nullptr;
  }
  npy_intp dims[1] = {m};
  PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(1, dims, NPY_INT32);
  const int32_t* tc = (const int32_t*)PyArray_DATA(tab);
  const int32_t* qc = (const int32_t*)PyArray_DATA(q);
  int32_t* od = (int32_t*)PyArray_DATA(out);

  Py_BEGIN_ALLOW_THREADS;
  HashTable table((size_t)n);
  for (npy_intp i = 0; i < n; ++i) table.insert(pack(tc + 4 * i), (int32_t)i);
  for (npy_intp i = 0; i < m; ++i) od[i] = table.find(pack(qc + 4 * i));
  Py_END_ALLOW_THREADS;

  Py_DECREF(tab);
  Py_DECREF(q);
  return (PyObject*)out;
}

// ------------------------------------------------------------------------
// Grid-cell exact kNN for host-side preprocessing at scale.
//
// The reference leans on KDTree / FAISS for its per-point PCA neighborhoods
// (core/data_transform/features.py:360); the repo's blocked brute-force kNN
// is O(N^2) and dominates preprocessing past ~500k points (scale rehearsal:
// 94 s of 202 s at 671k voxels).  Cell lists give exact kNN in
// O(N * ring_candidates): bucket points into cubic cells, expand chebyshev
// rings around each query until the k-th best distance beats the next
// ring's minimum possible distance.

struct CellIndex {
  HashTable cells;                 // cell key -> bucket id
  std::vector<int32_t> starts;     // CSR over buckets
  std::vector<int32_t> members;    // point ids per bucket
  float cell;

  CellIndex(const float* pts, npy_intp n, float cell_size)
      : cells((size_t)n), cell(cell_size) {
    std::vector<int64_t> keys((size_t)n);
    int32_t n_cells = 0;
    std::vector<int32_t> bucket_of((size_t)n);
    for (npy_intp i = 0; i < n; ++i) {
      keys[i] = key_of(pts + 3 * i);
      int32_t b = cells.find(keys[i]);
      if (b < 0) {
        b = n_cells++;
        cells.insert(keys[i], b);
      }
      bucket_of[i] = b;
    }
    std::vector<int32_t> counts((size_t)n_cells, 0);
    for (npy_intp i = 0; i < n; ++i) counts[bucket_of[i]]++;
    starts.assign((size_t)n_cells + 1, 0);
    for (int32_t b = 0; b < n_cells; ++b) starts[b + 1] = starts[b] + counts[b];
    members.resize((size_t)n);
    std::vector<int32_t> cursor(starts.begin(), starts.end() - 1);
    for (npy_intp i = 0; i < n; ++i) members[cursor[bucket_of[i]]++] = (int32_t)i;
  }

  inline int64_t key_of(const float* p) const {
    int32_t c[4] = {0, (int32_t)std::floor(p[0] / cell),
                    (int32_t)std::floor(p[1] / cell),
                    (int32_t)std::floor(p[2] / cell)};
    return pack(c);
  }

  inline int64_t key_at(int32_t cx, int32_t cy, int32_t cz) const {
    int32_t c[4] = {0, cx, cy, cz};
    return pack(c);
  }
};

// knn_grid(points f32 [N,3], queries f32 [M,3], k, cell)
//   -> (d2 f32 [M,k] ascending, idx int32 [M,k]); short neighborhoods pad
//      by repeating the nearest hit (covariance-shrinking semantics, like
//      pca_features' r_search clamp).
PyObject* knn_grid(PyObject*, PyObject* args) {
  PyObject *p_obj, *q_obj;
  long k;
  double cell;
  if (!PyArg_ParseTuple(args, "OOld", &p_obj, &q_obj, &k, &cell))
    return nullptr;
  PyArrayObject* p_arr = (PyArrayObject*)PyArray_FROM_OTF(
      p_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  PyArrayObject* q_arr = (PyArrayObject*)PyArray_FROM_OTF(
      q_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!p_arr || !q_arr || PyArray_NDIM(p_arr) != 2 ||
      PyArray_DIM(p_arr, 1) != 3 || PyArray_NDIM(q_arr) != 2 ||
      PyArray_DIM(q_arr, 1) != 3 || k < 1 || cell <= 0) {
    PyErr_SetString(PyExc_ValueError,
                    "knn_grid(points f32 [N,3], queries f32 [M,3], k>=1, "
                    "cell>0)");
    Py_XDECREF(p_arr);
    Py_XDECREF(q_arr);
    return nullptr;
  }
  npy_intp n = PyArray_DIM(p_arr, 0), m = PyArray_DIM(q_arr, 0);
  npy_intp dims[2] = {m, (npy_intp)k};
  PyArrayObject* d2_out = (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  PyArrayObject* id_out = (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_INT32);
  if (!d2_out || !id_out || n == 0) {
    if (n == 0) PyErr_SetString(PyExc_ValueError, "knn_grid: empty points");
    Py_XDECREF(d2_out);
    Py_XDECREF(id_out);
    Py_DECREF(p_arr);
    Py_DECREF(q_arr);
    return nullptr;
  }
  const float* pts = (const float*)PyArray_DATA(p_arr);
  const float* qs = (const float*)PyArray_DATA(q_arr);
  float* d2d = (float*)PyArray_DATA(d2_out);
  int32_t* idd = (int32_t*)PyArray_DATA(id_out);

  Py_BEGIN_ALLOW_THREADS;
  CellIndex index(pts, n, (float)cell);
  constexpr int R_MAX = 16;
  auto run = [&](npy_intp lo, npy_intp hi) {
    std::vector<std::pair<float, int32_t>> heap;  // max-heap on d2
    heap.reserve((size_t)k);
    for (npy_intp qi = lo; qi < hi; ++qi) {
      const float* q = qs + 3 * qi;
      const int32_t qcx = (int32_t)std::floor(q[0] / index.cell);
      const int32_t qcy = (int32_t)std::floor(q[1] / index.cell);
      const int32_t qcz = (int32_t)std::floor(q[2] / index.cell);
      heap.clear();
      for (int r = 0; r <= R_MAX; ++r) {
        for (int dx = -r; dx <= r; ++dx)
          for (int dy = -r; dy <= r; ++dy)
            for (int dz = -r; dz <= r; ++dz) {
              if (std::max({std::abs(dx), std::abs(dy), std::abs(dz)}) != r)
                continue;
              int32_t b = index.cells.find(
                  index.key_at(qcx + dx, qcy + dy, qcz + dz));
              if (b < 0) continue;
              for (int32_t s = index.starts[b]; s < index.starts[b + 1]; ++s) {
                const int32_t pi = index.members[s];
                const float* p = pts + 3 * pi;
                const float ddx = p[0] - q[0], ddy = p[1] - q[1],
                            ddz = p[2] - q[2];
                const float d2 = ddx * ddx + ddy * ddy + ddz * ddz;
                if ((npy_intp)heap.size() < k) {
                  heap.emplace_back(d2, pi);
                  std::push_heap(heap.begin(), heap.end());
                } else if (d2 < heap.front().first) {
                  std::pop_heap(heap.begin(), heap.end());
                  heap.back() = {d2, pi};
                  std::push_heap(heap.begin(), heap.end());
                }
              }
            }
        // unexplored cells sit at chebyshev >= r+1: their points are at
        // least r*cell away from anywhere inside the query's cell
        if ((npy_intp)heap.size() == k) {
          const float ring_min = (float)r * index.cell;
          if (heap.front().first <= ring_min * ring_min) break;
        }
      }
      std::sort_heap(heap.begin(), heap.end());  // ascending d2
      const npy_intp found = (npy_intp)heap.size();
      for (npy_intp j = 0; j < k; ++j) {
        const auto& e = heap[(size_t)std::min(j, found - 1)];
        d2d[qi * k + j] = e.first;
        idd[qi * k + j] = e.second;
      }
    }
  };
  const size_t hw = std::max(1u, std::thread::hardware_concurrency());
  const npy_intp n_threads = (npy_intp)std::min<size_t>({hw, 16});
  if (n_threads <= 1 || m < 4096) {
    run(0, m);
  } else {
    std::vector<std::thread> pool;
    npy_intp chunk = (m + n_threads - 1) / n_threads;
    for (npy_intp t = 0; t < n_threads; ++t) {
      npy_intp lo = t * chunk, hi = std::min<npy_intp>(m, lo + chunk);
      if (lo < hi) pool.emplace_back(run, lo, hi);
    }
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS;

  Py_DECREF(p_arr);
  Py_DECREF(q_arr);
  return Py_BuildValue("(NN)", d2_out, id_out);
}

PyMethodDef methods[] = {
    {"build_kernel_map", build_kernel_map, METH_VARARGS,
     "build_kernel_map(in_coords, out_coords, offsets, stride) -> nbr [K, M]"},
    {"unique_inverse", unique_inverse, METH_VARARGS,
     "unique_inverse(coords) -> (unique, inverse)"},
    {"query_coords", query_coords, METH_VARARGS,
     "query_coords(table, queries) -> idx (-1 miss)"},
    {"knn_grid", knn_grid, METH_VARARGS,
     "knn_grid(points, queries, k, cell) -> (d2 [M,k], idx [M,k])"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_kernelmap",
                         "native voxel hashing / kernel maps", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__kernelmap(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
