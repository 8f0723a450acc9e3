// CPython C-API bindings for the native runtime.
//
// Replaces the ctypes layer on the hot paths: a ctypes call costs ~2-4 us
// (argument marshalling + numpy buffer churn + tobytes copy), which dominated
// small-input decode (e.g. the 12 KiB stored-block fixture decodes in ~1 us
// of actual work). These bindings allocate the result PyBytes directly,
// decode into it, and resize — one allocation, zero copies, ~200 ns of call
// overhead. The GIL is released around the codec work so thread-pool
// parallel decode/encode scales (reference behavior: ctypes also released
// the GIL).
//
// Parity reference: /root/reference/src/zippy.nim public API error contract —
// every failure raises the single ZippyError type (common.nim:2), injected
// here via set_error_class() at import.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "zippy_native.cpp"

namespace {

PyObject* g_error_class = nullptr;  // ZippyError, injected from Python

PyObject* raise_err(const char* msg) {
  PyErr_SetString(g_error_class ? g_error_class : PyExc_ValueError, msg);
  return nullptr;
}

const char* err_message(int64_t rc, const char* fallback) {
  switch (rc) {
    case -1: return "Invalid compressed data";
    case -3: return "Checksum verification failed";
    case -4: return "Size verification failed";
    default: return fallback;
  }
}

// Borrowed read-only view of a bytes-like argument.
struct SrcView {
  Py_buffer view{};
  bool ok = false;
  explicit SrcView(PyObject* obj) {
    if (PyObject_GetBuffer(obj, &view, PyBUF_SIMPLE) == 0) ok = true;
  }
  ~SrcView() {
    if (ok) PyBuffer_Release(&view);
  }
  const uint8_t* data() const { return (const uint8_t*)view.buf; }
  size_t len() const { return (size_t)view.len; }
};

constexpr size_t kMaxExpansion = 1032;  // DEFLATE worst-case expansion bound

// cap = max(cap*2, 64 KiB), clamped to max_out; returns 0 when growth is
// exhausted (mirrors the former Python _grow_capped contract).
size_t grow_capped(size_t cap, size_t max_out) {
  size_t next = cap * 2 > (size_t)65536 ? cap * 2 : (size_t)65536;
  if (next > max_out) {
    if (next / 2 >= max_out) return 0;
    next = max_out;
  }
  return next;
}

bool parse_size(PyObject* obj, Py_ssize_t* out, const char* name) {
  Py_ssize_t v = PyNumber_AsSsize_t(obj, PyExc_OverflowError);
  if (v == -1 && PyErr_Occurred()) return false;
  *out = v;
  (void)name;
  return true;
}

// ---------------------------------------------------------------------------
// checksums
// ---------------------------------------------------------------------------

PyObject* py_crc32(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs < 1 || nargs > 2) return raise_err("crc32(data, value=0)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  unsigned long value = 0;
  if (nargs == 2) {
    value = PyLong_AsUnsignedLongMask(args[1]);
    if (PyErr_Occurred()) return nullptr;
  }
  uint32_t result;
  if (src.len() >= 4096) {
    Py_BEGIN_ALLOW_THREADS;
    result = zt_crc32_update((uint32_t)value, src.data(), src.len());
    Py_END_ALLOW_THREADS;
  } else {
    result = zt_crc32_update((uint32_t)value, src.data(), src.len());
  }
  return PyLong_FromUnsignedLong(result);
}

PyObject* py_adler32(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs < 1 || nargs > 2) return raise_err("adler32(data, value=1)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  unsigned long value = 1;
  if (nargs == 2) {
    value = PyLong_AsUnsignedLongMask(args[1]);
    if (PyErr_Occurred()) return nullptr;
  }
  uint32_t result;
  if (src.len() >= 4096) {
    Py_BEGIN_ALLOW_THREADS;
    result = zt_adler32_update((uint32_t)value, src.data(), src.len());
    Py_END_ALLOW_THREADS;
  } else {
    result = zt_adler32_update((uint32_t)value, src.data(), src.len());
  }
  return PyLong_FromUnsignedLong(result);
}

// ---------------------------------------------------------------------------
// raw deflate stream
// ---------------------------------------------------------------------------

// inflate(data, start_bit=0, size_hint=-1, max_output=-1) -> (bytes, end_bit)
PyObject* py_inflate(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs < 1 || nargs > 4)
    return raise_err("inflate(data, start_bit=0, size_hint=-1, max_output=-1)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  Py_ssize_t start_bit = 0, size_hint = -1, max_output = -1;
  if (nargs >= 2 && !parse_size(args[1], &start_bit, "start_bit")) return nullptr;
  if (nargs >= 3 && !parse_size(args[2], &size_hint, "size_hint")) return nullptr;
  if (nargs >= 4 && !parse_size(args[3], &max_output, "max_output")) return nullptr;

  size_t n = src.len();
  size_t cap = size_hint >= 0 ? (size_t)size_hint
                              : (4 * n > (size_t)65536 ? 4 * n : (size_t)65536);
  size_t max_out = max_output >= 0 ? (size_t)max_output : (size_t)-1;
  for (;;) {
    PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)cap);
    if (!out) return nullptr;
    size_t end_bit = 0;
    int64_t rc;
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_inflate(src.data(), n, (size_t)start_bit,
                    (uint8_t*)PyBytes_AS_STRING(out), cap, &end_bit);
    Py_END_ALLOW_THREADS;
    if (rc >= 0) {
      if (_PyBytes_Resize(&out, (Py_ssize_t)rc) < 0) return nullptr;
      PyObject* tup = Py_BuildValue("(Nn)", out, (Py_ssize_t)end_bit);
      return tup;
    }
    Py_DECREF(out);
    if (rc == -2) {
      if (size_hint >= 0 && cap == (size_t)size_hint) size_hint = -1;
      cap = grow_capped(cap, max_out);
      if (cap == 0) return raise_err("Uncompressed data too large");
      continue;
    }
    return raise_err("Invalid compressed data");
  }
}

// Persistent compress scratch: encoding into a worst-case-sized fresh
// PyBytes and shrinking costs a large cold allocation per call (mmap +
// page faults for multi-hundred-KiB bounds); the scratch's pages stay warm
// across calls and the exact-size PyBytes copy is cheap by comparison.
// Capped at 64 MiB — larger encodes fall back to direct-into-PyBytes.
// Only up to 8 MiB is retained between calls: a long-lived thread pool that
// once compressed a huge buffer must not pin 64 MiB per thread forever.
constexpr size_t kScratchMax = 64u << 20;
constexpr size_t kScratchRetain = 8u << 20;
std::vector<uint8_t>& compress_scratch(size_t need) {
  thread_local std::vector<uint8_t> buf;
  if (buf.size() < need) buf.resize(need);
  return buf;
}

// Copy the encoded prefix out of the scratch and release oversized backing
// storage (swap-with-empty actually frees; shrink_to_fit may not).
PyObject* scratch_to_bytes(std::vector<uint8_t>& buf, int64_t rc) {
  PyObject* out =
      PyBytes_FromStringAndSize((const char*)buf.data(), (Py_ssize_t)rc);
  if (buf.size() > kScratchRetain) std::vector<uint8_t>().swap(buf);
  return out;
}

// deflate(data, level) -> bytes
PyObject* py_deflate(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs != 2) return raise_err("deflate(data, level)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  long level = PyLong_AsLong(args[1]);
  if (level == -1 && PyErr_Occurred()) return nullptr;
  size_t cap = zt_deflate_bound(src.len());
  // Small bounds: encode straight into the result PyBytes and shrink —
  // pymalloc/realloc are warm at this size and it saves the scratch
  // copy (the scratch exists for LARGE bounds, where a worst-case-sized
  // fresh allocation means cold mmap pages).
  if (cap <= (128u << 10)) {
    PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)cap);
    if (!out) return nullptr;
    int64_t rc;
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_deflate(src.data(), src.len(), (int)level,
                    (uint8_t*)PyBytes_AS_STRING(out), cap);
    Py_END_ALLOW_THREADS;
    if (rc < 0) {
      Py_DECREF(out);
      return raise_err("deflate failed");
    }
    if (_PyBytes_Resize(&out, (Py_ssize_t)rc) < 0) return nullptr;
    return out;
  }
  if (cap <= kScratchMax) {
    std::vector<uint8_t>& buf = compress_scratch(cap);
    int64_t rc;
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_deflate(src.data(), src.len(), (int)level, buf.data(), cap);
    Py_END_ALLOW_THREADS;
    if (rc < 0) return raise_err("deflate failed");
    return scratch_to_bytes(buf, rc);
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)cap);
  if (!out) return nullptr;
  int64_t rc;
  Py_BEGIN_ALLOW_THREADS;
  rc = zt_deflate(src.data(), src.len(), (int)level,
                  (uint8_t*)PyBytes_AS_STRING(out), cap);
  Py_END_ALLOW_THREADS;
  if (rc < 0) {
    Py_DECREF(out);
    return raise_err("deflate failed");
  }
  if (_PyBytes_Resize(&out, (Py_ssize_t)rc) < 0) return nullptr;
  return out;
}

// ---------------------------------------------------------------------------
// gzip / zlib whole-stream paths
// ---------------------------------------------------------------------------

// gzip_uncompress(data, pos=0) -> (payload, consumed)
PyObject* py_gzip_uncompress(PyObject*, PyObject* const* args,
                             Py_ssize_t nargs) {
  if (nargs < 1 || nargs > 2) return raise_err("gzip_uncompress(data, pos=0)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  Py_ssize_t pos = 0;
  if (nargs == 2 && !parse_size(args[1], &pos, "pos")) return nullptr;
  if (pos < 0 || (size_t)pos > src.len()) return raise_err("Invalid gzip data");
  const uint8_t* p = src.data() + pos;
  size_t n = src.len() - (size_t)pos;
  if (n < 18) return raise_err("Invalid gzip data");
  // ISIZE trailer of the final member as a preallocation hint, capped by the
  // 1032:1 expansion bound (reference gzip.nim:72-77 trustSize semantics).
  const uint8_t* tz = p + n - 4;
  size_t isize = (size_t)tz[0] | ((size_t)tz[1] << 8) | ((size_t)tz[2] << 16) |
                 ((size_t)tz[3] << 24);
  size_t max_out = n * kMaxExpansion + 4096;
  size_t cap = isize + 64 > (size_t)4096 ? isize + 64 : (size_t)4096;
  if (cap > max_out) cap = max_out;
  for (;;) {
    PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)cap);
    if (!out) return nullptr;
    size_t consumed = 0;
    int64_t rc;
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_gzip_uncompress(p, n, (uint8_t*)PyBytes_AS_STRING(out), cap,
                            &consumed);
    Py_END_ALLOW_THREADS;
    if (rc >= 0) {
      if (_PyBytes_Resize(&out, (Py_ssize_t)rc) < 0) return nullptr;
      return Py_BuildValue("(Nn)", out, (Py_ssize_t)consumed);
    }
    Py_DECREF(out);
    if (rc == -2) {
      cap = grow_capped(cap, max_out);
      if (cap == 0) return raise_err("Uncompressed data too large");
      continue;
    }
    return raise_err(err_message(rc, "Invalid gzip data"));
  }
}

// gzip_compress(data, level, name_pad=-1) -> bytes
PyObject* py_gzip_compress(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs < 2 || nargs > 3)
    return raise_err("gzip_compress(data, level, name_pad=-1)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  long level = PyLong_AsLong(args[1]);
  if (level == -1 && PyErr_Occurred()) return nullptr;
  long name_pad = -1;
  if (nargs == 3) {
    name_pad = PyLong_AsLong(args[2]);
    if (name_pad == -1 && PyErr_Occurred()) return nullptr;
  }
  size_t cap = zt_deflate_bound(src.len()) + 64;
  if (cap <= kScratchMax) {
    std::vector<uint8_t>& buf = compress_scratch(cap);
    int64_t rc;
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_gzip_compress(src.data(), src.len(), (int)level, buf.data(), cap,
                          (int)name_pad);
    Py_END_ALLOW_THREADS;
    if (rc < 0) return raise_err("gzip compress failed");
    return scratch_to_bytes(buf, rc);
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)cap);
  if (!out) return nullptr;
  int64_t rc;
  Py_BEGIN_ALLOW_THREADS;
  rc = zt_gzip_compress(src.data(), src.len(), (int)level,
                        (uint8_t*)PyBytes_AS_STRING(out), cap, (int)name_pad);
  Py_END_ALLOW_THREADS;
  if (rc < 0) {
    Py_DECREF(out);
    return raise_err("gzip compress failed");
  }
  if (_PyBytes_Resize(&out, (Py_ssize_t)rc) < 0) return nullptr;
  return out;
}

// zlib_uncompress(data) -> bytes
PyObject* py_zlib_uncompress(PyObject*, PyObject* const* args,
                             Py_ssize_t nargs) {
  if (nargs != 1) return raise_err("zlib_uncompress(data)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  size_t n = src.len();
  if (n < 6) return raise_err("Invalid compressed data");
  size_t max_out = n * kMaxExpansion + 4096;
  size_t cap = 8 * n > (size_t)65536 ? 8 * n : (size_t)65536;
  if (cap > max_out) cap = max_out;
  for (;;) {
    PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)cap);
    if (!out) return nullptr;
    int64_t rc;
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_zlib_uncompress(src.data(), n, (uint8_t*)PyBytes_AS_STRING(out),
                            cap);
    Py_END_ALLOW_THREADS;
    if (rc >= 0) {
      if (_PyBytes_Resize(&out, (Py_ssize_t)rc) < 0) return nullptr;
      return out;
    }
    Py_DECREF(out);
    if (rc == -2) {
      cap = grow_capped(cap, max_out);
      if (cap == 0) return raise_err("Uncompressed data too large");
      continue;
    }
    return raise_err(err_message(rc, "Invalid compressed data"));
  }
}

// zlib_compress(data, level) -> bytes
PyObject* py_zlib_compress(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs != 2) return raise_err("zlib_compress(data, level)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  long level = PyLong_AsLong(args[1]);
  if (level == -1 && PyErr_Occurred()) return nullptr;
  size_t cap = zt_deflate_bound(src.len()) + 16;
  if (cap <= kScratchMax) {
    std::vector<uint8_t>& buf = compress_scratch(cap);
    int64_t rc;
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_zlib_compress(src.data(), src.len(), (int)level, buf.data(), cap);
    Py_END_ALLOW_THREADS;
    if (rc < 0) return raise_err("zlib compress failed");
    return scratch_to_bytes(buf, rc);
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)cap);
  if (!out) return nullptr;
  int64_t rc;
  Py_BEGIN_ALLOW_THREADS;
  rc = zt_zlib_compress(src.data(), src.len(), (int)level,
                        (uint8_t*)PyBytes_AS_STRING(out), cap);
  Py_END_ALLOW_THREADS;
  if (rc < 0) {
    Py_DECREF(out);
    return raise_err("zlib compress failed");
  }
  if (_PyBytes_Resize(&out, (Py_ssize_t)rc) < 0) return nullptr;
  return out;
}

// uncompress_auto(data) -> bytes | (first_payload, consumed)
// Magic-byte format detection + whole decode in one call (reference
// dfDetect, zippy.nim:109-125). For a multi-member gzip stream (trailing
// bytes after the first member) returns the already-decoded first payload
// plus the byte offset of the next member so the Python concatenation loop
// resumes there instead of re-decoding member 1; raises ZippyError on
// undetectable/invalid input.
PyObject* py_uncompress_auto(PyObject* self, PyObject* const* args,
                             Py_ssize_t nargs) {
  if (nargs != 1) return raise_err("uncompress_auto(data)");
  Py_buffer view{};
  if (PyObject_GetBuffer(args[0], &view, PyBUF_SIMPLE) != 0) return nullptr;
  const uint8_t* p = (const uint8_t*)view.buf;
  size_t n = (size_t)view.len;
  bool is_gzip = n > 18 && p[0] == 0x1F && p[1] == 0x8B && p[2] == 8 &&
                 (p[3] & 0xE0) == 0;
  bool is_zlib = !is_gzip && n > 6 && (p[0] & 0x0F) == 8 && (p[0] >> 4) <= 7 &&
                 ((uint32_t)p[0] * 256 + p[1]) % 31 == 0;
  PyBuffer_Release(&view);
  if (is_gzip) {
    PyObject* tup = py_gzip_uncompress(self, args, 1);
    if (!tup) return nullptr;
    PyObject* payload = PyTuple_GET_ITEM(tup, 0);
    Py_ssize_t consumed = PyLong_AsSsize_t(PyTuple_GET_ITEM(tup, 1));
    if ((size_t)consumed == n) {
      Py_INCREF(payload);
      Py_DECREF(tup);
      return payload;
    }
    return tup;  // multi-member: Python loop resumes at `consumed`
  }
  if (is_zlib) return py_zlib_uncompress(self, args, 1);
  return raise_err("Unable to detect compressed data format");
}

// inflate_scan(data, start_bit, every, seg_buf, sto_buf, lens_buf, counts_buf)
//   -> rc (0 ok, -1 malformed, -2 caps exceeded — counts filled, retry sized).
// Buffers are writable bytes-like (bytearray): seg int64[cap][6],
// sto int64[cap][3], lens uint8[cap][318], counts int64[6]. The decode-index
// scan for device-parallel inflate (ops/inflate_device.py).
PyObject* py_inflate_scan(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
  if (nargs != 7)
    return raise_err(
        "inflate_scan(data, start_bit, every, seg, sto, lens, counts)");
  SrcView src(args[0]);
  if (!src.ok) return nullptr;
  Py_ssize_t start_bit = 0;
  if (!parse_size(args[1], &start_bit, "start_bit")) return nullptr;
  long every = PyLong_AsLong(args[2]);
  if (every == -1 && PyErr_Occurred()) return nullptr;
  Py_buffer seg{}, sto{}, lens{}, counts{};
  if (PyObject_GetBuffer(args[3], &seg, PyBUF_WRITABLE) != 0) return nullptr;
  if (PyObject_GetBuffer(args[4], &sto, PyBUF_WRITABLE) != 0) {
    PyBuffer_Release(&seg);
    return nullptr;
  }
  if (PyObject_GetBuffer(args[5], &lens, PyBUF_WRITABLE) != 0) {
    PyBuffer_Release(&seg);
    PyBuffer_Release(&sto);
    return nullptr;
  }
  if (PyObject_GetBuffer(args[6], &counts, PyBUF_WRITABLE) != 0) {
    PyBuffer_Release(&seg);
    PyBuffer_Release(&sto);
    PyBuffer_Release(&lens);
    return nullptr;
  }
  int64_t rc;
  if ((size_t)counts.len < 7 * sizeof(int64_t)) {
    rc = -1;
    PyErr_SetString(PyExc_ValueError, "counts buffer too small");
  } else {
    Py_BEGIN_ALLOW_THREADS;
    rc = zt_inflate_scan(
        src.data(), src.len(), (size_t)start_bit, (uint32_t)every,
        (int64_t*)seg.buf, (size_t)seg.len / (6 * sizeof(int64_t)),
        (int64_t*)sto.buf, (size_t)sto.len / (3 * sizeof(int64_t)),
        (uint8_t*)lens.buf, (size_t)lens.len / 318, (int64_t*)counts.buf);
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&seg);
  PyBuffer_Release(&sto);
  PyBuffer_Release(&lens);
  PyBuffer_Release(&counts);
  if (PyErr_Occurred()) return nullptr;
  return PyLong_FromLongLong(rc);
}

// set_error_class(exc) — install ZippyError so failures raise the public type.
PyObject* py_set_error_class(PyObject*, PyObject* arg) {
  Py_XDECREF(g_error_class);
  Py_INCREF(arg);
  g_error_class = arg;
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"crc32", (PyCFunction)(void*)py_crc32, METH_FASTCALL, nullptr},
    {"adler32", (PyCFunction)(void*)py_adler32, METH_FASTCALL, nullptr},
    {"inflate", (PyCFunction)(void*)py_inflate, METH_FASTCALL, nullptr},
    {"deflate", (PyCFunction)(void*)py_deflate, METH_FASTCALL, nullptr},
    {"gzip_uncompress", (PyCFunction)(void*)py_gzip_uncompress, METH_FASTCALL,
     nullptr},
    {"gzip_compress", (PyCFunction)(void*)py_gzip_compress, METH_FASTCALL,
     nullptr},
    {"zlib_uncompress", (PyCFunction)(void*)py_zlib_uncompress, METH_FASTCALL,
     nullptr},
    {"zlib_compress", (PyCFunction)(void*)py_zlib_compress, METH_FASTCALL,
     nullptr},
    {"uncompress_auto", (PyCFunction)(void*)py_uncompress_auto, METH_FASTCALL,
     nullptr},
    {"inflate_scan", (PyCFunction)(void*)py_inflate_scan, METH_FASTCALL,
     nullptr},
    {"set_error_class", (PyCFunction)py_set_error_class, METH_O, nullptr},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_pyzt",
    "Native codec bindings (CPython C API)", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__pyzt() { return PyModule_Create(&kModule); }
