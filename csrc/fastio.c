/* fastio — native mesh/voxel IO for the meshrcnn_tpu data layer.
 *
 * CPython extension (no pybind11 in this environment) providing:
 *   parse_obj(bytes)      -> (vertices float32 [V,3], faces int32 [F,3])
 *   decode_binvox(bytes)  -> flat uint8 occupancy array (caller reshapes)
 *
 * The pure-Python OBJ parser tokenises line-by-line (~10-30x slower); at TPU
 * step rates the single-core host data path becomes the bottleneck, so the
 * format decoding runs natively. Semantics match
 * meshrcnn_tpu/data/serialization.py exactly: polygons are strip-triangulated
 * with a sliding window ((i, i+1, i+2) per extra vertex — the reference
 * convention, serialization.py:117-121) and 1-based indices are converted to
 * 0-based by the Python wrapper.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>
#include <string.h>

static int grow(void **buf, size_t *cap, size_t needed, size_t elem) {
    if (needed <= *cap) return 0;
    size_t ncap = *cap ? *cap * 2 : 1024;
    while (ncap < needed) ncap *= 2;
    void *nb = realloc(*buf, ncap * elem);
    if (!nb) return -1;
    *buf = nb;
    *cap = ncap;
    return 0;
}

static PyObject *parse_obj(PyObject *self, PyObject *args) {
    const char *data;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "y#", &data, &len)) return NULL;

    float *verts = NULL;
    size_t vcap = 0, vcount = 0;      /* floats */
    long *faces = NULL;
    size_t fcap = 0, fcount = 0;      /* longs  */

    const char *p = data;
    const char *end = data + len;
    long poly[64];

    while (p < end) {
        /* skip leading spaces */
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
        if (p >= end) break;
        if (*p == 'v' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            for (int k = 0; k < 3; k++) {
                char *q;
                double val = strtod(p, &q);
                if (q == p) { val = 0.0; }
                p = q;
                if (grow((void **)&verts, &vcap, vcount + 1, sizeof(float)) < 0)
                    goto nomem;
                verts[vcount++] = (float)val;
            }
        } else if (*p == 'f' && p + 1 < end && (p[1] == ' ' || p[1] == '\t')) {
            p += 2;
            int n = 0;
            while (p < end && *p != '\n' && n < 64) {
                while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
                if (p >= end || *p == '\n') break;
                char *q;
                long idx = strtol(p, &q, 10);
                if (q == p) break;
                p = q;
                /* skip /texture/normal refs */
                while (p < end && *p != ' ' && *p != '\t' && *p != '\n'
                       && *p != '\r') p++;
                poly[n++] = idx;
            }
            for (int i = 0; i + 2 < n; i++) {   /* sliding-window strip */
                if (grow((void **)&faces, &fcap, fcount + 3, sizeof(long)) < 0)
                    goto nomem;
                faces[fcount++] = poly[i];
                faces[fcount++] = poly[i + 1];
                faces[fcount++] = poly[i + 2];
            }
        }
        /* advance to next line */
        while (p < end && *p != '\n') p++;
        if (p < end) p++;
    }

    {
        PyObject *vb = PyBytes_FromStringAndSize((const char *)verts,
                                                 (Py_ssize_t)(vcount * sizeof(float)));
        PyObject *fb = PyBytes_FromStringAndSize((const char *)faces,
                                                 (Py_ssize_t)(fcount * sizeof(long)));
        free(verts);
        free(faces);
        if (!vb || !fb) { Py_XDECREF(vb); Py_XDECREF(fb); return NULL; }
        PyObject *out = Py_BuildValue("(NnNn)", vb, (Py_ssize_t)(vcount / 3),
                                      fb, (Py_ssize_t)(fcount / 3));
        return out;
    }
nomem:
    free(verts);
    free(faces);
    return PyErr_NoMemory();
}

static PyObject *decode_rle(PyObject *self, PyObject *args) {
    /* binvox payload: (value, count) byte pairs -> expanded uint8 bytes */
    const char *data;
    Py_ssize_t len;
    Py_ssize_t total;
    if (!PyArg_ParseTuple(args, "y#n", &data, &len, &total)) return NULL;
    PyObject *out = PyBytes_FromStringAndSize(NULL, total);
    if (!out) return NULL;
    char *dst = PyBytes_AS_STRING(out);
    Py_ssize_t w = 0;
    for (Py_ssize_t i = 0; i + 1 < len && w < total; i += 2) {
        char val = data[i];
        Py_ssize_t count = (unsigned char)data[i + 1];
        if (w + count > total) count = total - w;
        memset(dst + w, val, (size_t)count);
        w += count;
    }
    if (w < total) memset(dst + w, 0, (size_t)(total - w));
    return out;
}

static PyMethodDef methods[] = {
    {"parse_obj", parse_obj, METH_VARARGS,
     "parse_obj(bytes) -> (vert_bytes, n_verts, face_bytes, n_faces)"},
    {"decode_rle", decode_rle, METH_VARARGS,
     "decode_rle(payload, total) -> expanded uint8 bytes"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastio", "native mesh/voxel IO", -1, methods};

PyMODINIT_FUNC PyInit_fastio(void) { return PyModule_Create(&moduledef); }
