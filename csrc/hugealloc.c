/* Fast-fault numpy allocator.
 *
 * This VM (Firecracker-style kernel) demand-pages PRIVATE anonymous memory
 * at ~3300 faults/s — first touch of every fresh numpy allocation costs
 * ~40-60s/GB (measured).  SHARED anonymous mappings take a different fault
 * path and run at ~0.6s/GB (measured; MAP_PRIVATE 53s vs MAP_SHARED 0.59s
 * for the same 1GB write).  This module installs a PyDataMem handler that
 * backs every allocation >= 4MB with a MAP_SHARED|MAP_ANONYMOUS mmap
 * (plus MADV_HUGEPAGE, harmless elsewhere and useful on normal hosts).
 *
 * Caveat: MAP_SHARED means fork()ed children share (not COW) these numpy
 * buffers.  Nothing in this package forks-and-writes numpy arrays; disable
 * with DMT_NO_HUGEPAGE_ALLOC=1 if embedding code does.
 *
 * All allocations carry a 64-byte header (magic + total size) so free/
 * realloc can tell mmap blocks from malloc blocks.
 */
#define _GNU_SOURCE
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>

#define HDR 64
#define MAGIC_MMAP 0x4d4d415050474531ULL
#define MAGIC_MALLOC 0x4d414c4c4f433031ULL
#define BIG ((size_t)4 << 20)

static size_t round_up(size_t n, size_t a) { return (n + a - 1) & ~(a - 1); }

static void *hp_malloc_impl(void *ctx, size_t size) {
  (void)ctx;
  size_t total = size + HDR;
  if (total >= BIG) {
    size_t sz = round_up(total, 4096);
    void *p = mmap(NULL, sz, PROT_READ | PROT_WRITE,
                   MAP_SHARED | MAP_ANONYMOUS, -1, 0);
    if (p == MAP_FAILED)
      return NULL;
    madvise(p, sz, MADV_HUGEPAGE);
    ((uint64_t *)p)[0] = MAGIC_MMAP;
    ((uint64_t *)p)[1] = sz;
    return (char *)p + HDR;
  }
  void *p = malloc(total);
  if (!p)
    return NULL;
  ((uint64_t *)p)[0] = MAGIC_MALLOC;
  ((uint64_t *)p)[1] = total;
  return (char *)p + HDR;
}

static void *hp_calloc_impl(void *ctx, size_t nelem, size_t elsize) {
  size_t size = nelem * elsize; /* numpy checks overflow upstream */
  if (size + HDR >= BIG)
    return hp_malloc_impl(ctx, size); /* fresh anonymous mmap is zeroed */
  void *p = calloc(1, size + HDR);
  if (!p)
    return NULL;
  ((uint64_t *)p)[0] = MAGIC_MALLOC;
  ((uint64_t *)p)[1] = size + HDR;
  return (char *)p + HDR;
}

static void hp_free_impl(void *ctx, void *ptr, size_t size) {
  (void)ctx;
  (void)size;
  if (!ptr)
    return;
  char *base = (char *)ptr - HDR;
  uint64_t magic = ((uint64_t *)base)[0];
  uint64_t sz = ((uint64_t *)base)[1];
  if (magic == MAGIC_MMAP)
    munmap(base, sz);
  else
    free(base);
}

static void *hp_realloc_impl(void *ctx, void *ptr, size_t new_size) {
  if (!ptr)
    return hp_malloc_impl(ctx, new_size);
  char *base = (char *)ptr - HDR;
  uint64_t magic = ((uint64_t *)base)[0];
  uint64_t sz = ((uint64_t *)base)[1];
  if (magic == MAGIC_MMAP) {
    size_t newtotal = round_up(new_size + HDR, 4096);
    if (newtotal >= BIG) {
      void *p = mremap(base, sz, newtotal, MREMAP_MAYMOVE);
      if (p == MAP_FAILED)
        return NULL;
      madvise(p, newtotal, MADV_HUGEPAGE);
      ((uint64_t *)p)[0] = MAGIC_MMAP;
      ((uint64_t *)p)[1] = newtotal;
      return (char *)p + HDR;
    }
    void *r = hp_malloc_impl(ctx, new_size);
    if (r)
      memcpy(r, ptr, new_size < sz - HDR ? new_size : sz - HDR);
    munmap(base, sz);
    return r;
  }
  if (new_size + HDR >= BIG) {
    void *r = hp_malloc_impl(ctx, new_size);
    if (r)
      memcpy(r, ptr, sz - HDR < new_size ? sz - HDR : new_size);
    free(base);
    return r;
  }
  void *p = realloc(base, new_size + HDR);
  if (!p)
    return NULL;
  ((uint64_t *)p)[0] = MAGIC_MALLOC;
  ((uint64_t *)p)[1] = new_size + HDR;
  return (char *)p + HDR;
}

static PyDataMem_Handler hp_handler = {
    "hugepage_allocator",
    1,
    {
        NULL,
        hp_malloc_impl,
        hp_calloc_impl,
        hp_realloc_impl,
        hp_free_impl,
    },
};

static PyObject *install(PyObject *self, PyObject *args) {
  (void)self;
  (void)args;
  PyObject *cap = PyCapsule_New(&hp_handler, "mem_handler", NULL);
  if (!cap)
    return NULL;
  PyObject *old = PyDataMem_SetHandler(cap);
  Py_DECREF(cap);
  if (!old)
    return NULL;
  Py_DECREF(old);
  Py_RETURN_NONE;
}

static PyMethodDef hp_methods[] = {
    {"install", install, METH_NOARGS,
     "Install the huge-page numpy allocation handler."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef hp_module = {
    PyModuleDef_HEAD_INIT, "_hugealloc",
    "Huge-page numpy allocator (see csrc/hugealloc.c).", -1, hp_methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__hugealloc(void) {
  import_array();
  return PyModule_Create(&hp_module);
}
