// rlrpt_io — native scene & data IO runtime for the TPU framework.
//
// The reference implements its whole data layer in C++ (OBJ importer:
// GPU_Rendering_Engine/Source/objects/object_importer.cu; Q-table text IO:
// radiance_map.cu:237-268; BMP dump: sdl_screen.cpp:60-66).  This library
// is the TPU build's native equivalent: the host-side loaders/savers that
// feed the JAX compute path.  Exposed with a plain C ABI for ctypes.
//
// Build: make -C csrc   (produces csrc/librlrpt_io.so)

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> verts;       // 3 per vertex, normalised
  std::vector<int64_t> faces;     // 3 per (fan-triangulated) face, 1-based
};

// Parse `v`/`f` lines with fan triangulation, `x/x/x` tokens supported
// (matches object_importer.cu:22-89 and the python importer parse_obj).
bool parse_obj(const char* path, ObjData& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  if (size > 0 && std::fread(&buf[0], 1, size, f) != (size_t)size) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);

  const char* p = buf.c_str();
  const char* end = p + buf.size();
  std::vector<int64_t> face_idx;
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    // Tolerate leading whitespace: the bundled cube.obj's first line is
    // " v 0.0 ..." (the reference's token splitter drops empty tokens,
    // object_importer.cu split_string, so it parses it too).
    while (p < line_end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
    if (p >= line_end) { p = line_end + 1; continue; }
    if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      char* q = const_cast<char*>(p) + 1;
      float x = std::strtof(q, &q);
      float y = std::strtof(q, &q);
      float z = std::strtof(q, &q);
      out.verts.push_back(x);
      out.verts.push_back(y);
      out.verts.push_back(z);
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      face_idx.clear();
      const char* q = p + 1;
      while (q < line_end) {
        while (q < line_end && std::isspace((unsigned char)*q)) q++;
        if (q >= line_end) break;
        char* next = nullptr;
        long idx = std::strtol(q, &next, 10);
        if (next == q) break;
        face_idx.push_back(idx);
        q = next;
        while (q < line_end && !std::isspace((unsigned char)*q)) q++;  // skip /x/x
      }
      // fan triangulation (i0, ik, ik+1)
      for (size_t k = 1; k + 1 < face_idx.size(); k++) {
        out.faces.push_back(face_idx[0]);
        out.faces.push_back(face_idx[k]);
        out.faces.push_back(face_idx[k + 1]);
      }
    }
    p = line_end + 1;
  }
  return true;
}

// The reference's normalisation (object_importer.cu:93-145): min/max
// initialised at 0, literal scale 2, translate min corner to (-1,-1,-1),
// flip x and y.
void normalise(std::vector<float>& verts) {
  float mn[3] = {0.f, 0.f, 0.f};
  for (size_t i = 0; i < verts.size(); i += 3)
    for (int c = 0; c < 3; c++)
      if (verts[i + c] < mn[c]) mn[c] = verts[i + c];
  const float scale = 2.f;
  float dist[3];
  for (int c = 0; c < 3; c++) dist[c] = -1.f - mn[c] * scale;
  for (size_t i = 0; i < verts.size(); i += 3) {
    verts[i + 0] = -(verts[i + 0] * scale + dist[0]);
    verts[i + 1] = -(verts[i + 1] * scale + dist[1]);
    verts[i + 2] = verts[i + 2] * scale + dist[2];
  }
}

}  // namespace

extern "C" {

// Two-phase API: load (returns handle + counts), copy out, free.
struct ObjHandle {
  ObjData data;
};

ObjHandle* rlrpt_obj_load(const char* path, int do_normalise,
                          int64_t* n_verts, int64_t* n_tris) {
  ObjHandle* h = new ObjHandle();
  if (!parse_obj(path, h->data)) {
    delete h;
    return nullptr;
  }
  if (do_normalise) normalise(h->data.verts);
  *n_verts = (int64_t)(h->data.verts.size() / 3);
  *n_tris = (int64_t)(h->data.faces.size() / 3);
  return h;
}

void rlrpt_obj_copy(ObjHandle* h, float* verts_out, int64_t* faces_out) {
  std::memcpy(verts_out, h->data.verts.data(),
              h->data.verts.size() * sizeof(float));
  std::memcpy(faces_out, h->data.faces.data(),
              h->data.faces.size() * sizeof(int64_t));
}

void rlrpt_obj_free(ObjHandle* h) { delete h; }

// Q-table text IO (format: radiance_map.cu:237-268 — "S\n" then
// "x y z q1..qS" rows with %.6g formatting).
int rlrpt_save_q_table(const char* path, const float* pos, const float* q,
                       int64_t n_volumes, int64_t n_sectors) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::fprintf(f, "%lld\n", (long long)n_sectors);
  for (int64_t i = 0; i < n_volumes; i++) {
    std::fprintf(f, "%.6g %.6g %.6g", pos[i * 3], pos[i * 3 + 1],
                 pos[i * 3 + 2]);
    for (int64_t s = 0; s < n_sectors; s++)
      std::fprintf(f, " %.6g", q[i * n_sectors + s]);
    std::fputc('\n', f);
  }
  std::fclose(f);
  return 0;
}

// Returns n_volumes (or -1); caller allocates after a first sizing call
// with pos == nullptr.
int64_t rlrpt_load_q_table(const char* path, float* pos, float* q,
                           int64_t* n_sectors_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long long s = 0;
  if (std::fscanf(f, "%lld", &s) != 1) {
    std::fclose(f);
    return -1;
  }
  *n_sectors_out = (int64_t)s;
  int64_t count = 0;
  while (true) {
    float x, y, z;
    if (std::fscanf(f, "%f %f %f", &x, &y, &z) != 3) break;
    if (pos) {
      pos[count * 3] = x;
      pos[count * 3 + 1] = y;
      pos[count * 3 + 2] = z;
    }
    for (long long i = 0; i < s; i++) {
      float v;
      if (std::fscanf(f, "%f", &v) != 1) {
        std::fclose(f);
        return -1;
      }
      if (q) q[count * s + i] = v;
    }
    count++;
  }
  std::fclose(f);
  return count;
}

// 24-bit uncompressed BMP writer (the SDL_SaveImage format,
// sdl_screen.cpp:60-66).  img is uint8 RGB, row-major top-down.
int rlrpt_write_bmp(const char* path, const uint8_t* img, int64_t w,
                    int64_t h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int64_t row = w * 3;
  int64_t stride = (row + 3) & ~3ll;
  uint32_t size = 54 + (uint32_t)(stride * h);
  uint8_t header[54] = {0};
  header[0] = 'B'; header[1] = 'M';
  std::memcpy(header + 2, &size, 4);
  header[10] = 54;
  uint32_t info_size = 40, planes_bpp = 1 | (24 << 16);
  int32_t iw = (int32_t)w, ih = (int32_t)h;
  std::memcpy(header + 14, &info_size, 4);
  std::memcpy(header + 18, &iw, 4);
  std::memcpy(header + 22, &ih, 4);
  std::memcpy(header + 26, &planes_bpp, 4);
  uint32_t img_size = (uint32_t)(stride * h), ppm = 2835;
  std::memcpy(header + 34, &img_size, 4);
  std::memcpy(header + 38, &ppm, 4);
  std::memcpy(header + 42, &ppm, 4);
  std::fwrite(header, 1, 54, f);
  std::vector<uint8_t> rowbuf(stride, 0);
  for (int64_t y = h - 1; y >= 0; y--) {   // bottom-up
    const uint8_t* src = img + y * row;
    for (int64_t x = 0; x < w; x++) {      // RGB -> BGR
      rowbuf[x * 3 + 0] = src[x * 3 + 2];
      rowbuf[x * 3 + 1] = src[x * 3 + 1];
      rowbuf[x * 3 + 2] = src[x * 3 + 0];
    }
    std::fwrite(rowbuf.data(), 1, stride, f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
