/* CPython C-extension binding for the per-record hot calls.
 *
 * ctypes costs ~3 us per call in argument marshalling — more than the
 * codec itself on ~1 KiB records (the dictionary small-record workload,
 * BASELINE config #3; reference analog: the CGO call surface,
 * clz4/clz4.go:27-94). This module binds the same lz4r entry points
 * through the CPython C API directly (~0.3 us/call) and is compiled
 * together with lz4r.cpp into one shared object by
 * plz4_tpu/native/__init__.py (same hash-cached build scheme as the
 * ctypes .so). The ctypes layer remains both the fallback when the
 * extension build is unavailable and the binding for everything outside
 * the record hot path (batch calls already amortize via one C call per
 * group).
 *
 * Exposed: block_compress / block_decompress / dict ctx
 * (create/compress/free via capsule) / stream compress-decompress ctxs.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <limits.h>
#include <stdint.h>

/* lz4r entry points (compiled into this same .so from lz4r.cpp; C
 * linkage — this file may itself be compiled as C or C++) */
#ifdef __cplusplus
extern "C" {
#endif
extern int lz4r_compress_bound(int);
extern int lz4r_compress(const uint8_t*, int, uint8_t*, int, int,
                         const uint8_t*, int);
extern int lz4r_decompress(const uint8_t*, int, uint8_t*, int,
                           const uint8_t*, int);
typedef struct Lz4rDictCtx Lz4rDictCtx;
extern Lz4rDictCtx* lz4r_dict_create(const uint8_t*, int);
extern int lz4r_dict_compress(Lz4rDictCtx*, const uint8_t*, int, uint8_t*,
                              int, int);
extern void lz4r_dict_free(Lz4rDictCtx*);
#ifdef __cplusplus
}
#endif

/* One reusable output scratch per thread. A pthread key destructor frees
 * it at thread exit — plain __thread pointers have no destructor, which
 * would leak up to compress_bound(largest input) per short-lived thread
 * in servers with thread churn. */
#include <pthread.h>

static pthread_key_t tl_key;
static pthread_once_t tl_once = PTHREAD_ONCE_INIT;

static void tl_free(void* p) { PyMem_RawFree(p); }

static void tl_make_key(void) { pthread_key_create(&tl_key, tl_free); }

static __thread uint8_t* tl_buf = NULL;
static __thread Py_ssize_t tl_cap = 0;

static uint8_t* get_buf(Py_ssize_t need) {
    if (need <= tl_cap && tl_buf) return tl_buf;
    Py_ssize_t cap = need < (1 << 16) ? (1 << 16) : need;
    uint8_t* b = (uint8_t*)PyMem_RawMalloc((size_t)cap);
    if (!b) return NULL;
    PyMem_RawFree(tl_buf);
    tl_buf = b;
    tl_cap = cap;
    pthread_once(&tl_once, tl_make_key);
    pthread_setspecific(tl_key, b);
    return b;
}

/* the lz4r ABI takes int sizes: reject anything that would truncate
 * (the ctypes fallback fails loudly on c_int overflow; the extension
 * must not silently compress a 2 GiB prefix of nothing) */
static int check_int_size(Py_ssize_t n, const char* what) {
    if (n > INT_MAX) {
        PyErr_Format(PyExc_OverflowError, "%s too large for lz4 block: %zd",
                     what, n);
        return 0;
    }
    return 1;
}

/* block_compress(src: bytes-like, level: int, dict: bytes-like|None)
 *   -> bytes | None (None = incompressible / doesn't fit) */
static PyObject* py_block_compress(PyObject* self, PyObject* args) {
    Py_buffer src, dict;
    int level;
    PyObject* dict_obj;
    if (!PyArg_ParseTuple(args, "y*iO", &src, &level, &dict_obj)) return NULL;
    if (!check_int_size(src.len, "source")) {
        PyBuffer_Release(&src);
        return NULL;
    }
    dict.buf = NULL;
    dict.len = 0;
    if (dict_obj != Py_None) {
        if (PyObject_GetBuffer(dict_obj, &dict, PyBUF_SIMPLE) != 0) {
            PyBuffer_Release(&src);
            return NULL;
        }
    }
    int cap = lz4r_compress_bound((int)src.len);
    uint8_t* dst = get_buf(cap > 0 ? cap : 1);
    if (!dst) {
        PyBuffer_Release(&src);
        if (dict.buf) PyBuffer_Release(&dict);
        return PyErr_NoMemory();
    }
    int n;
    Py_BEGIN_ALLOW_THREADS
    n = lz4r_compress((const uint8_t*)src.buf, (int)src.len, dst, cap, level,
                      (const uint8_t*)dict.buf, (int)dict.len);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&src);
    if (dict.buf) PyBuffer_Release(&dict);
    if (n <= 0) Py_RETURN_NONE;
    return PyBytes_FromStringAndSize((const char*)dst, n);
}

/* block_decompress(src, dst_cap: int, dict|None) -> bytes | None(corrupt) */
static PyObject* py_block_decompress(PyObject* self, PyObject* args) {
    Py_buffer src, dict;
    Py_ssize_t dst_cap;
    PyObject* dict_obj;
    if (!PyArg_ParseTuple(args, "y*nO", &src, &dst_cap, &dict_obj))
        return NULL;
    if (dst_cap < 0) dst_cap = 0;
    if (!check_int_size(src.len, "source") ||
        !check_int_size(dst_cap, "dst_cap")) {
        PyBuffer_Release(&src);
        return NULL;
    }
    dict.buf = NULL;
    dict.len = 0;
    if (dict_obj != Py_None) {
        if (PyObject_GetBuffer(dict_obj, &dict, PyBUF_SIMPLE) != 0) {
            PyBuffer_Release(&src);
            return NULL;
        }
    }
    uint8_t* dst = get_buf(dst_cap > 0 ? dst_cap : 1);
    if (!dst) {
        PyBuffer_Release(&src);
        if (dict.buf) PyBuffer_Release(&dict);
        return PyErr_NoMemory();
    }
    int n;
    Py_BEGIN_ALLOW_THREADS
    n = lz4r_decompress((const uint8_t*)src.buf, (int)src.len, dst,
                        (int)dst_cap, (const uint8_t*)dict.buf,
                        (int)dict.len);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&src);
    if (dict.buf) PyBuffer_Release(&dict);
    if (n < 0) Py_RETURN_NONE;
    return PyBytes_FromStringAndSize((const char*)dst, n);
}

static void dict_capsule_free(PyObject* cap) {
    Lz4rDictCtx* c = (Lz4rDictCtx*)PyCapsule_GetPointer(cap, "plz4.dictctx");
    if (c) lz4r_dict_free(c);
}

static PyObject* py_dict_create(PyObject* self, PyObject* args) {
    Py_buffer dict;
    if (!PyArg_ParseTuple(args, "y*", &dict)) return NULL;
    Lz4rDictCtx* c = lz4r_dict_create((const uint8_t*)dict.buf,
                                      (int)dict.len);
    PyBuffer_Release(&dict);
    if (!c) return PyErr_NoMemory();
    return PyCapsule_New(c, "plz4.dictctx", dict_capsule_free);
}

static PyObject* py_dict_compress(PyObject* self, PyObject* args) {
    PyObject* cap_obj;
    Py_buffer src;
    int level;
    if (!PyArg_ParseTuple(args, "Oy*i", &cap_obj, &src, &level)) return NULL;
    if (!check_int_size(src.len, "source")) {
        PyBuffer_Release(&src);
        return NULL;
    }
    Lz4rDictCtx* c =
        (Lz4rDictCtx*)PyCapsule_GetPointer(cap_obj, "plz4.dictctx");
    if (!c) {
        PyBuffer_Release(&src);
        return NULL;
    }
    int cap = lz4r_compress_bound((int)src.len);
    uint8_t* dst = get_buf(cap > 0 ? cap : 1);
    if (!dst) {
        PyBuffer_Release(&src);
        return PyErr_NoMemory();
    }
    int n;
    Py_BEGIN_ALLOW_THREADS
    n = lz4r_dict_compress(c, (const uint8_t*)src.buf, (int)src.len, dst,
                           cap, level);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&src);
    if (n <= 0) Py_RETURN_NONE;
    return PyBytes_FromStringAndSize((const char*)dst, n);
}

static PyMethodDef Methods[] = {
    {"block_compress", py_block_compress, METH_VARARGS,
     "compress(src, level, dict|None) -> bytes | None"},
    {"block_decompress", py_block_decompress, METH_VARARGS,
     "decompress(src, dst_cap, dict|None) -> bytes | None"},
    {"dict_create", py_dict_create, METH_VARARGS,
     "dict_create(window) -> capsule"},
    {"dict_compress", py_dict_compress, METH_VARARGS,
     "dict_compress(capsule, src, level) -> bytes | None"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "plz4_ext",
    "C-extension fast path for per-record lz4r calls", -1, Methods,
};

PyMODINIT_FUNC PyInit_plz4_ext(void) { return PyModule_Create(&moduledef); }
