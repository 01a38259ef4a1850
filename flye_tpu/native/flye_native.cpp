// Native host helpers for flye_tpu hot loops.
//
// The reference keeps its host runtime in C++ (thread pool, containers,
// parsers — reference: src/common/, src/sequence/sequence_container.cpp);
// flye_tpu keeps the device plane in JAX and implements the hot HOST
// loops here: chain backtracking (the only sequential part of overlap
// detection, reference: src/sequence/overlap.cpp:330-385) and
// FASTA/FASTQ byte packing.  Interfaces use the buffer protocol (bytes
// in/out) so no NumPy C API is needed; Python wraps results with
// np.frombuffer.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

// ---------------------------------------------------------------------
// backtrack_chains(score_bytes, parent_bytes, n, k, max_chains)
//   score/parent: int32 arrays as bytes; returns list of
//   (first, last, chain_score, path_bytes[int32])
// Mirrors the reference's score-ordered backtracking with visited
// marking (reference: overlap.cpp:330-385).
// ---------------------------------------------------------------------
static PyObject* backtrack_chains(PyObject*, PyObject* args) {
  Py_buffer score_buf, parent_buf;
  Py_ssize_t n;
  int k, max_chains;
  if (!PyArg_ParseTuple(args, "y*y*nii", &score_buf, &parent_buf, &n, &k,
                        &max_chains)) {
    return nullptr;
  }
  const int32_t* score = static_cast<const int32_t*>(score_buf.buf);
  std::vector<int32_t> parent(n);
  std::memcpy(parent.data(), parent_buf.buf, n * sizeof(int32_t));

  // argsort by -score, stable
  std::vector<int32_t> order(n);
  for (Py_ssize_t i = 0; i < n; ++i) order[i] = (int32_t)i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return score[a] > score[b]; });

  PyObject* result = PyList_New(0);
  std::vector<int32_t> path;
  for (Py_ssize_t oi = 0; oi < n; ++oi) {
    int32_t start = order[oi];
    if (parent[start] == -1) continue;
    path.clear();
    int32_t pos = start;
    while (pos != -1) {
      path.push_back(pos);
      int32_t nxt = parent[pos];
      parent[pos] = -1;
      pos = nxt;
    }
    int32_t first = path.back();
    int32_t last = path.front();
    int64_t chain_score =
        (int64_t)score[last] - (int64_t)score[first] + k - 1;
    std::reverse(path.begin(), path.end());
    PyObject* path_bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(path.data()),
        path.size() * sizeof(int32_t));
    PyObject* tup = Py_BuildValue("iiLN", first, last,
                                  (long long)chain_score, path_bytes);
    PyList_Append(result, tup);
    Py_DECREF(tup);
    if (max_chains > 0 && PyList_Size(result) >= max_chains) break;
  }
  PyBuffer_Release(&score_buf);
  PyBuffer_Release(&parent_buf);
  return result;
}

// ---------------------------------------------------------------------
// pack_sequences(raw_bytes, is_fastq) -> (codes_bytes, offsets_bytes,
//                                         names_list)
//   One pass over a FASTA/FASTQ blob: translate ACGTacgt -> 0..3
//   (others -> 0), concatenate into a code arena with int64 offsets.
// ---------------------------------------------------------------------
static PyObject* pack_sequences(PyObject*, PyObject* args) {
  Py_buffer raw;
  int is_fastq;
  if (!PyArg_ParseTuple(args, "y*i", &raw, &is_fastq)) return nullptr;
  const char* data = static_cast<const char*>(raw.buf);
  const Py_ssize_t len = raw.len;

  static unsigned char table[256];
  static bool init = false;
  if (!init) {
    std::memset(table, 0, sizeof(table));
    table[(unsigned char)'C'] = table[(unsigned char)'c'] = 1;
    table[(unsigned char)'G'] = table[(unsigned char)'g'] = 2;
    table[(unsigned char)'T'] = table[(unsigned char)'t'] = 3;
    init = true;
  }

  std::vector<unsigned char> codes;
  codes.reserve(len / 2);
  std::vector<int64_t> offsets;
  offsets.push_back(0);
  PyObject* names = PyList_New(0);

  Py_ssize_t i = 0;
  auto append_name = [&](const char* s, Py_ssize_t l) {
    Py_ssize_t e = 0;
    while (e < l && s[e] != ' ' && s[e] != '\t' && s[e] != '\r') ++e;
    PyObject* nm = PyUnicode_FromStringAndSize(s, e);
    PyList_Append(names, nm);
    Py_DECREF(nm);
  };

  if (is_fastq) {
    while (i < len) {
      // header line
      while (i < len && (data[i] == '\n' || data[i] == '\r')) ++i;
      if (i >= len) break;
      if (data[i] != '@') {
        PyErr_SetString(PyExc_ValueError, "malformed FASTQ");
        Py_DECREF(names);
        PyBuffer_Release(&raw);
        return nullptr;
      }
      Py_ssize_t hs = ++i;
      while (i < len && data[i] != '\n') ++i;
      append_name(data + hs, i - hs);
      ++i;
      // sequence line
      while (i < len && data[i] != '\n') {
        if (data[i] != '\r') codes.push_back(table[(unsigned char)data[i]]);
        ++i;
      }
      offsets.push_back((int64_t)codes.size());
      ++i;
      // '+' line
      while (i < len && data[i] != '\n') ++i;
      ++i;
      // quality line
      while (i < len && data[i] != '\n') ++i;
      ++i;
    }
  } else {
    while (i < len && data[i] != '>') ++i;
    while (i < len) {
      Py_ssize_t hs = ++i;  // skip '>'
      while (i < len && data[i] != '\n') ++i;
      append_name(data + hs, i - hs);
      ++i;
      while (i < len && data[i] != '>') {
        char c = data[i];
        if (c != '\n' && c != '\r') codes.push_back(table[(unsigned char)c]);
        ++i;
      }
      offsets.push_back((int64_t)codes.size());
    }
  }

  PyObject* codes_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(codes.data()), codes.size());
  PyObject* offs_b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(offsets.data()),
      offsets.size() * sizeof(int64_t));
  PyBuffer_Release(&raw);
  return Py_BuildValue("NNN", codes_b, offs_b, names);
}

// ---------------------------------------------------------------------
// window_coverage(begins, ends, n, n_windows, window) -> counts bytes
//   Shared helper for chimera/multiplicity window counting.
// ---------------------------------------------------------------------
static PyObject* window_coverage(PyObject*, PyObject* args) {
  Py_buffer beg_buf, end_buf;
  Py_ssize_t n;
  int n_windows, window;
  if (!PyArg_ParseTuple(args, "y*y*nii", &beg_buf, &end_buf, &n,
                        &n_windows, &window)) {
    return nullptr;
  }
  const int32_t* beg = static_cast<const int32_t*>(beg_buf.buf);
  const int32_t* end = static_cast<const int32_t*>(end_buf.buf);
  std::vector<int32_t> cov(n_windows, 0);
  for (Py_ssize_t i = 0; i < n; ++i) {
    int lo = beg[i] / window;
    int hi = end[i] / window;
    if (lo < 0) lo = 0;
    if (hi > n_windows) hi = n_windows;
    for (int w = lo; w < hi; ++w) cov[w] += 1;
  }
  PyObject* out = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(cov.data()),
      cov.size() * sizeof(int32_t));
  PyBuffer_Release(&beg_buf);
  PyBuffer_Release(&end_buf);
  return out;
}

static PyMethodDef methods[] = {
    {"backtrack_chains", backtrack_chains, METH_VARARGS,
     "Score-ordered chain backtracking with visited marking"},
    {"pack_sequences", pack_sequences, METH_VARARGS,
     "Parse FASTA/FASTQ bytes into a 2-bit code arena"},
    {"window_coverage", window_coverage, METH_VARARGS,
     "Interval -> window coverage counting"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT,
                                       "flye_native", nullptr, -1, methods};

PyMODINIT_FUNC PyInit_flye_native(void) {
  return PyModule_Create(&moduledef);
}
