// CPython extension binding for the native engine (optional fast layer).
//
// The ctypes binding (see __init__.py) is the portable path; this module
// removes the remaining Python-side costs for the list-returning APIs:
// the GIL is released for the whole C++ encode (like the reference's
// pybind11 gil_scoped_release, /root/reference/src/py_binding.cpp:26-44 —
// behavior studied, binding written fresh for the CPython C API), and the
// result list is built directly with PyList_SET_ITEM instead of
// numpy->tolist.
//
// Build (see __init__.py): compiled together with tdnative.cpp into one
// shared object exposing PyInit_tdpy.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>

extern "C" {
void* td_create(const uint8_t*, const int8_t*, const int32_t*, int64_t,
                int32_t, const int32_t*, int);
void td_destroy(void*);
void td_set_vocab(void*, const uint8_t*, const int64_t*, const int32_t*,
                  const int32_t*, int64_t);
int64_t td_scan(const void*, const uint8_t*, int64_t, int32_t*, int64_t);
int64_t td_encode(const void*, const uint8_t*, int64_t, int32_t*, int64_t);
}

namespace {

void capsule_destructor(PyObject* cap) {
  void* h = PyCapsule_GetPointer(cap, "tdpy.engine");
  if (h) td_destroy(h);
}

const void* buf_ptr(Py_buffer* view) { return view->buf; }

// tdpy.create(classes, fold, pair_rows, nbuckets, mask, byte_rank,
//             contractions) -> capsule
// All buffers must outlive the capsule (the Python side keeps references).
PyObject* py_create(PyObject*, PyObject* args) {
  Py_buffer classes, fold, pair_rows, byte_rank;
  long long nbuckets;
  int mask, contractions;
  if (!PyArg_ParseTuple(args, "y*y*y*Liy*i", &classes, &fold, &pair_rows,
                        &nbuckets, &mask, &byte_rank, &contractions))
    return nullptr;
  void* h = td_create((const uint8_t*)classes.buf, (const int8_t*)fold.buf,
                      (const int32_t*)pair_rows.buf, nbuckets, mask,
                      (const int32_t*)byte_rank.buf, contractions);
  PyBuffer_Release(&classes);
  PyBuffer_Release(&fold);
  PyBuffer_Release(&pair_rows);
  PyBuffer_Release(&byte_rank);
  if (!h) {
    PyErr_SetString(PyExc_RuntimeError, "td_create failed");
    return nullptr;
  }
  return PyCapsule_New(h, "tdpy.engine", capsule_destructor);
}

PyObject* py_set_vocab(PyObject*, PyObject* args) {
  PyObject* cap;
  Py_buffer blob, offs, lens, ranks;
  long long n;
  if (!PyArg_ParseTuple(args, "Oy*y*y*y*L", &cap, &blob, &offs, &lens,
                        &ranks, &n))
    return nullptr;
  void* h = PyCapsule_GetPointer(cap, "tdpy.engine");
  if (h) {
    td_set_vocab(h, (const uint8_t*)blob.buf, (const int64_t*)offs.buf,
                 (const int32_t*)lens.buf, (const int32_t*)ranks.buf, n);
  }
  PyBuffer_Release(&blob);
  PyBuffer_Release(&offs);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&ranks);
  if (!h) return nullptr;  // PyCapsule_GetPointer set the error
  Py_RETURN_NONE;
}

// tdpy.encode_list(capsule, data: bytes) -> list[int]
PyObject* py_encode_list(PyObject*, PyObject* args) {
  PyObject* cap;
  Py_buffer data;
  if (!PyArg_ParseTuple(args, "Oy*", &cap, &data)) return nullptr;
  void* h = PyCapsule_GetPointer(cap, "tdpy.engine");
  if (!h) {
    PyBuffer_Release(&data);
    return nullptr;
  }
  int64_t n = data.len;
  int32_t* out = (int32_t*)PyMem_Malloc(sizeof(int32_t) * (n ? n : 1));
  if (!out) {
    PyBuffer_Release(&data);
    return PyErr_NoMemory();
  }
  int64_t count;
  Py_BEGIN_ALLOW_THREADS
  count = td_encode(h, (const uint8_t*)data.buf, n, out, n);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&data);
  if (count < 0) {
    PyMem_Free(out);
    if (count == -2) {
      // vocab not installed / missing byte ranks: signal fallback
      Py_RETURN_NONE;
    }
    PyErr_SetString(PyExc_RuntimeError, "td_encode failed");
    return nullptr;
  }
  PyObject* list = PyList_New(count);
  if (!list) {
    PyMem_Free(out);
    return nullptr;
  }
  for (int64_t i = 0; i < count; ++i) {
    PyObject* v = PyLong_FromLong(out[i]);
    if (!v) {
      Py_DECREF(list);
      PyMem_Free(out);
      return nullptr;
    }
    PyList_SET_ITEM(list, i, v);
  }
  PyMem_Free(out);
  // Untrack from the cyclic GC: the list holds only ints, so it can never
  // participate in a reference cycle. Without this, full collections
  // traverse every token of every result list — at corpus scale (tens of
  // millions of ids alive) GC dominates the runtime (measured 7x).
  PyObject_GC_UnTrack(list);
  return list;
}

PyMethodDef methods[] = {
    {"create", py_create, METH_VARARGS, "create engine"},
    {"set_vocab", py_set_vocab, METH_VARARGS, "install vocab hash"},
    {"encode_list", py_encode_list, METH_VARARGS,
     "encode bytes -> list of token ids (GIL-free encode)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "tdpy", "native engine CPython binding",
    -1, methods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_tdpy(void) { return PyModule_Create(&moduledef); }
