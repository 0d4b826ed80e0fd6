// Native host-side volumetric IoU kernels.
//
// The reference's evaluation and association inner loops are
// O(#pred x #gt x frames) Python (viou at
// /root/reference/lib/evaluation/common.py:65-106 called from the greedy
// matcher at visual_relation_detection.py:8-26, and the per-frame numpy
// loop in trajectory._intersect at lib/modeling/trajectory.py:85-107).
// On-device work stays in XLA; this extension covers the HOST side of
// those loops — VidOR-scale videos have thousands of relation instances,
// making the pairwise vIoU matrix the evaluation/association bottleneck.
//
// Exposed via the plain CPython buffer protocol (no numpy C API), so it
// builds with a bare toolchain; tspn_tpu.native wraps it with a NumPy
// fallback when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Buffer {
  Py_buffer view{};
  bool ok = false;
  ~Buffer() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* obj) {
    if (PyObject_GetBuffer(obj, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) != 0)
      return false;
    ok = true;
    if (!view.format || std::strcmp(view.format, "d") != 0) {
      PyErr_SetString(PyExc_TypeError, "expected float64 C-contiguous array");
      return false;
    }
    return true;
  }
  const double* data() const { return static_cast<const double*>(view.buf); }
};

inline double box_area(const double* b) {
  return (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
}

inline double box_inter(const double* a, const double* b) {
  double w = std::min(a[2], b[2]) - std::max(a[0], b[0]) + 1.0;
  double h = std::min(a[3], b[3]) - std::max(a[1], b[1]) + 1.0;
  if (w <= 0.0 || h <= 0.0) return 0.0;
  return w * h;
}

// cubic_iou(a (n, t, 4), b (m, t, 4)) -> (n, m) float64
PyObject* cubic_iou(PyObject*, PyObject* args) {
  PyObject *a_obj, *b_obj;
  if (!PyArg_ParseTuple(args, "OO", &a_obj, &b_obj)) return nullptr;
  Buffer a, b;
  if (!a.acquire(a_obj) || !b.acquire(b_obj)) return nullptr;
  if (a.view.ndim != 3 || b.view.ndim != 3 || a.view.shape[2] != 4 ||
      b.view.shape[2] != 4 || a.view.shape[1] != b.view.shape[1]) {
    PyErr_SetString(PyExc_ValueError, "expected (n,t,4) and (m,t,4)");
    return nullptr;
  }
  const Py_ssize_t n = a.view.shape[0], m = b.view.shape[0],
                   t = a.view.shape[1];
  const double* pa = a.data();
  const double* pb = b.data();

  std::vector<double> vol_a(n, 0.0), vol_b(m, 0.0);
  for (Py_ssize_t i = 0; i < n; ++i)
    for (Py_ssize_t f = 0; f < t; ++f) vol_a[i] += box_area(pa + (i * t + f) * 4);
  for (Py_ssize_t j = 0; j < m; ++j)
    for (Py_ssize_t f = 0; f < t; ++f) vol_b[j] += box_area(pb + (j * t + f) * 4);

  PyObject* out = PyByteArray_FromStringAndSize(nullptr, n * m * sizeof(double));
  if (!out) return nullptr;  // allocation failure
  double* po = reinterpret_cast<double*>(PyByteArray_AS_STRING(out));
  for (Py_ssize_t i = 0; i < n; ++i) {
    for (Py_ssize_t j = 0; j < m; ++j) {
      double inter = 0.0;
      const double* ra = pa + i * t * 4;
      const double* rb = pb + j * t * 4;
      for (Py_ssize_t f = 0; f < t; ++f)
        inter += box_inter(ra + f * 4, rb + f * 4);
      double uni = vol_a[i] + vol_b[j] - inter;
      po[i * m + j] = uni > 0.0 ? inter / uni : 0.0;
    }
  }
  return out;
}

// viou(a (ta, 4), sa, ea, b (tb, 4), sb, eb) -> float
// durations [s, e) on the frame axis; union spans full trajectories.
PyObject* viou(PyObject*, PyObject* args) {
  PyObject *a_obj, *b_obj;
  long long sa, ea, sb, eb;
  if (!PyArg_ParseTuple(args, "OLLOLL", &a_obj, &sa, &ea, &b_obj, &sb, &eb))
    return nullptr;
  Buffer a, b;
  if (!a.acquire(a_obj) || !b.acquire(b_obj)) return nullptr;
  if (a.view.ndim != 2 || b.view.ndim != 2 || a.view.shape[1] != 4 ||
      b.view.shape[1] != 4) {
    PyErr_SetString(PyExc_ValueError, "expected (t,4) boxes");
    return nullptr;
  }
  if (a.view.shape[0] != ea - sa || b.view.shape[0] != eb - sb) {
    PyErr_SetString(PyExc_ValueError,
                    "trajectory length does not match its duration");
    return nullptr;
  }
  const double* pa = a.data();
  const double* pb = b.data();
  const long long s = std::max(sa, sb), e = std::min(ea, eb);
  double inter = 0.0;
  for (long long f = s; f < e; ++f)
    inter += box_inter(pa + (f - sa) * 4, pb + (f - sb) * 4);
  double vol = 0.0;
  for (Py_ssize_t f = 0; f < a.view.shape[0]; ++f) vol += box_area(pa + f * 4);
  for (Py_ssize_t f = 0; f < b.view.shape[0]; ++f) vol += box_area(pb + f * 4);
  double uni = vol - inter;
  return PyFloat_FromDouble(e <= s ? 0.0 : (uni > 0.0 ? inter / uni : 0.0));
}

// viou_matrix: pairwise viou between two trajectory SETS with durations.
// packed layout: boxes (sum_t, 4); offsets (k+1,) int64; durations (k, 2) int64
PyObject* viou_matrix(PyObject*, PyObject* args) {
  PyObject *ab_obj, *ao_obj, *ad_obj, *bb_obj, *bo_obj, *bd_obj;
  if (!PyArg_ParseTuple(args, "OOOOOO", &ab_obj, &ao_obj, &ad_obj, &bb_obj,
                        &bo_obj, &bd_obj))
    return nullptr;
  Buffer ab, bb;
  if (!ab.acquire(ab_obj) || !bb.acquire(bb_obj)) return nullptr;
  // RAII for the int64 side buffers so every exit path releases them
  struct IntBuf {
    Py_buffer view{};
    bool ok = false;
    ~IntBuf() {
      if (ok) PyBuffer_Release(&view);
    }
    bool acquire(PyObject* obj) {
      ok = PyObject_GetBuffer(obj, &view, PyBUF_C_CONTIGUOUS) == 0;
      return ok;
    }
    const int64_t* data() const { return static_cast<const int64_t*>(view.buf); }
  } ao, ad, bo, bd;
  if (!ao.acquire(ao_obj) || !ad.acquire(ad_obj) || !bo.acquire(bo_obj) ||
      !bd.acquire(bd_obj))
    return nullptr;
  const int64_t* a_off = ao.data();
  const int64_t* a_dur = ad.data();
  const int64_t* b_off = bo.data();
  const int64_t* b_dur = bd.data();
  const Py_ssize_t na = ao.view.len / 8 - 1, nb = bo.view.len / 8 - 1;
  const double* pa = ab.data();
  const double* pb = bb.data();
  // validate: offsets consistent with durations and within the box buffers
  for (Py_ssize_t i = 0; i < na; ++i) {
    if (a_off[i + 1] - a_off[i] != a_dur[i * 2 + 1] - a_dur[i * 2] ||
        a_off[i + 1] * 4 * (Py_ssize_t)sizeof(double) > ab.view.len) {
      PyErr_SetString(PyExc_ValueError, "set A: offsets/durations mismatch");
      return nullptr;
    }
  }
  for (Py_ssize_t j = 0; j < nb; ++j) {
    if (b_off[j + 1] - b_off[j] != b_dur[j * 2 + 1] - b_dur[j * 2] ||
        b_off[j + 1] * 4 * (Py_ssize_t)sizeof(double) > bb.view.len) {
      PyErr_SetString(PyExc_ValueError, "set B: offsets/durations mismatch");
      return nullptr;
    }
  }

  std::vector<double> vol_a(na, 0.0), vol_b(nb, 0.0);
  for (Py_ssize_t i = 0; i < na; ++i)
    for (int64_t f = a_off[i]; f < a_off[i + 1]; ++f)
      vol_a[i] += box_area(pa + f * 4);
  for (Py_ssize_t j = 0; j < nb; ++j)
    for (int64_t f = b_off[j]; f < b_off[j + 1]; ++f)
      vol_b[j] += box_area(pb + f * 4);

  PyObject* out =
      PyByteArray_FromStringAndSize(nullptr, na * nb * sizeof(double));
  if (!out) return nullptr;
  double* po = reinterpret_cast<double*>(PyByteArray_AS_STRING(out));
  for (Py_ssize_t i = 0; i < na; ++i) {
    const int64_t sa = a_dur[i * 2], ea = a_dur[i * 2 + 1];
    for (Py_ssize_t j = 0; j < nb; ++j) {
      const int64_t sb = b_dur[j * 2], eb = b_dur[j * 2 + 1];
      const int64_t s = std::max(sa, sb), e = std::min(ea, eb);
      double v = 0.0;
      if (e > s) {
        double inter = 0.0;
        const double* ra = pa + (a_off[i] + (s - sa)) * 4;
        const double* rb = pb + (b_off[j] + (s - sb)) * 4;
        for (int64_t f = 0; f < e - s; ++f)
          inter += box_inter(ra + f * 4, rb + f * 4);
        double uni = vol_a[i] + vol_b[j] - inter;
        v = uni > 0.0 ? inter / uni : 0.0;
      }
      po[i * nb + j] = v;
    }
  }
  return out;  // IntBuf destructors release the side buffers
}

PyMethodDef methods[] = {
    {"cubic_iou", cubic_iou, METH_VARARGS,
     "cubic_iou(a (n,t,4) f64, b (m,t,4) f64) -> bytearray (n*m f64)"},
    {"viou", viou, METH_VARARGS,
     "viou(a (t,4) f64, sa, ea, b (t,4) f64, sb, eb) -> float"},
    {"viou_matrix", viou_matrix, METH_VARARGS,
     "packed pairwise viou -> bytearray (na*nb f64)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_viou_native",
                      "native volumetric IoU kernels", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__viou_native(void) { return PyModule_Create(&module); }
