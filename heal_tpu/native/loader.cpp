// Native host data-loader core.
//
// TPU-native replacement for the reference's host-side native components
// (SURVEY.md §2.7): the Cython bbox_overlaps IoU matrix used in anchor
// target assignment (utils/box_overlaps.pyx), the spconv CPU voxelizer
// consumed by the data pipeline, and pypcd's PCD parsing. These are the
// CPU hot loops of label generation and disk ingest — this host has one
// core, so they are C++ with a ctypes ABI (no pybind11 in the image).
//
// Build: python -m heal_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Pascal-VOC "+1" axis-aligned IoU matrix (anchor target assignment).
// boxes (N, 4) [x1 y1 x2 y2], query (K, 4) -> out (N, K)
void bbox_overlaps(const float* boxes, int64_t n, const float* query,
                   int64_t k, float* out, int plus_one) {
  const float off = plus_one ? 1.0f : 0.0f;
  for (int64_t j = 0; j < k; ++j) {
    const float qx1 = query[j * 4 + 0], qy1 = query[j * 4 + 1];
    const float qx2 = query[j * 4 + 2], qy2 = query[j * 4 + 3];
    const float qarea = (qx2 - qx1 + off) * (qy2 - qy1 + off);
    for (int64_t i = 0; i < n; ++i) {
      const float bx1 = boxes[i * 4 + 0], by1 = boxes[i * 4 + 1];
      const float bx2 = boxes[i * 4 + 2], by2 = boxes[i * 4 + 3];
      const float iw = std::min(bx2, qx2) - std::max(bx1, qx1) + off;
      float v = 0.0f;
      if (iw > 0) {
        const float ih = std::min(by2, qy2) - std::max(by1, qy1) + off;
        if (ih > 0) {
          const float ua = (bx2 - bx1 + off) * (by2 - by1 + off) + qarea -
                           iw * ih;
          v = iw * ih / ua;
        }
      }
      out[i * k + j] = v;
    }
  }
}

// ---------------------------------------------------------------------
// Range filter + pad: points (N, 4) -> out (max_out, 4), mask (max_out)
// Returns number of kept points (pre-cap).
int64_t range_filter_pad(const float* pts, int64_t n, const float* range6,
                         float* out, uint8_t* mask, int64_t max_out) {
  int64_t kept = 0, written = 0;
  std::memset(out, 0, sizeof(float) * 4 * max_out);
  std::memset(mask, 0, max_out);
  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * 4 + 0], y = pts[i * 4 + 1], z = pts[i * 4 + 2];
    if (x < range6[0] || x > range6[3] || y < range6[1] || y > range6[4] ||
        z < range6[2] || z > range6[5])
      continue;
    ++kept;
    if (written < max_out) {
      std::memcpy(out + written * 4, pts + i * 4, sizeof(float) * 4);
      mask[written] = 1;
      ++written;
    }
  }
  return kept;
}

// ---------------------------------------------------------------------
// Minimal PCD reader (ascii or binary, fields x y z [intensity]).
// Returns point count and fills out (capacity cap, 4 floats per point);
// -1 on error.
int64_t read_pcd(const char* path, float* out, int64_t cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t count = 0;
  int n_fields = 4;
  int ascii = 1;
  int field_idx[8] = {0, 1, 2, 3, -1, -1, -1, -1};
  while (std::fgets(line, sizeof(line), f)) {
    if (std::strncmp(line, "FIELDS", 6) == 0) {
      n_fields = 0;
      char* tok = std::strtok(line + 6, " \r\n");
      int xi = -1, yi = -1, zi = -1, ii = -1;
      int idx = 0;
      while (tok) {
        if (!std::strcmp(tok, "x")) xi = idx;
        else if (!std::strcmp(tok, "y")) yi = idx;
        else if (!std::strcmp(tok, "z")) zi = idx;
        else if (!std::strcmp(tok, "intensity")) ii = idx;
        ++idx;
        tok = std::strtok(nullptr, " \r\n");
      }
      n_fields = idx;
      field_idx[0] = xi; field_idx[1] = yi; field_idx[2] = zi;
      field_idx[3] = ii;
    } else if (std::strncmp(line, "POINTS", 6) == 0) {
      count = std::atoll(line + 6);
    } else if (std::strncmp(line, "DATA", 4) == 0) {
      ascii = std::strstr(line, "ascii") != nullptr;
      break;
    }
  }
  if (count <= 0) { std::fclose(f); return -1; }
  const int64_t n = std::min(count, cap);
  if (ascii) {
    std::vector<float> row(n_fields);
    for (int64_t i = 0; i < n; ++i) {
      for (int c = 0; c < n_fields; ++c) {
        if (std::fscanf(f, "%f", &row[c]) != 1) { std::fclose(f); return i; }
      }
      out[i * 4 + 0] = row[field_idx[0]];
      out[i * 4 + 1] = row[field_idx[1]];
      out[i * 4 + 2] = row[field_idx[2]];
      out[i * 4 + 3] = field_idx[3] >= 0 ? row[field_idx[3]] : 1.0f;
    }
  } else {
    std::vector<float> buf((size_t)n * n_fields);
    size_t got = std::fread(buf.data(), sizeof(float) * n_fields, n, f);
    for (int64_t i = 0; i < (int64_t)got; ++i) {
      out[i * 4 + 0] = buf[i * n_fields + field_idx[0]];
      out[i * 4 + 1] = buf[i * n_fields + field_idx[1]];
      out[i * 4 + 2] = buf[i * n_fields + field_idx[2]];
      out[i * 4 + 3] =
          field_idx[3] >= 0 ? buf[i * n_fields + field_idx[3]] : 1.0f;
    }
  }
  std::fclose(f);
  return n;
}

// ---------------------------------------------------------------------
// Host voxelizer (spconv VoxelGeneratorV2 parity): points -> up to
// max_voxels voxels with up to max_points points each, plus coords
// (z, y, x) and per-voxel counts. Grid hash via a flat int32 table.
int64_t voxelize(const float* pts, int64_t n, const float* range6,
                 const float* voxel_size, int64_t max_voxels,
                 int64_t max_points, float* voxels /* (V, P, 4) */,
                 int32_t* coords /* (V, 3) */,
                 int32_t* counts /* (V,) */) {
  const float vx = voxel_size[0], vy = voxel_size[1], vz = voxel_size[2];
  const int nx = (int)std::round((range6[3] - range6[0]) / vx);
  const int ny = (int)std::round((range6[4] - range6[1]) / vy);
  const int nz = (int)std::round((range6[5] - range6[2]) / vz);
  const int64_t cells = (int64_t)nx * ny * nz;
  int32_t* table = (int32_t*)std::malloc(sizeof(int32_t) * cells);
  std::memset(table, 0xff, sizeof(int32_t) * cells);
  std::memset(counts, 0, sizeof(int32_t) * max_voxels);
  int64_t v_used = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * 4], y = pts[i * 4 + 1], z = pts[i * 4 + 2];
    const int xi = (int)std::floor((x - range6[0]) / vx);
    const int yi = (int)std::floor((y - range6[1]) / vy);
    const int zi = (int)std::floor((z - range6[2]) / vz);
    if (xi < 0 || xi >= nx || yi < 0 || yi >= ny || zi < 0 || zi >= nz)
      continue;
    const int64_t key = ((int64_t)zi * ny + yi) * nx + xi;
    int32_t vid = table[key];
    if (vid < 0) {
      if (v_used >= max_voxels) continue;
      vid = (int32_t)v_used++;
      table[key] = vid;
      coords[vid * 3 + 0] = zi;
      coords[vid * 3 + 1] = yi;
      coords[vid * 3 + 2] = xi;
    }
    int32_t& c = counts[vid];
    if (c < max_points) {
      std::memcpy(voxels + ((int64_t)vid * max_points + c) * 4,
                  pts + i * 4, sizeof(float) * 4);
      ++c;
    }
  }
  std::free(table);
  return v_used;
}

}  // extern "C"
