// PCD point-cloud codec (binary + ascii) for the PointXYZRGBA contract
// the reference reads/writes via PCL (src/GraphicEnd.cpp:281,
// src/convert2PCD.cpp:78; format sample data/exp1/pcd/1.pcd). Parses the
// header, streams x/y/z into a float32 array and rgb/rgba into uint32.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Field {
  std::string name;
  int size = 4;
  char type = 'F';
  int count = 1;
  int offset = 0;  // byte offset within a binary point record
};

struct PcdHeader {
  std::vector<Field> fields;
  int64_t points = 0;
  int point_step = 0;
  int data_mode = -1;  // 0 ascii, 1 binary
  int64_t data_start = 0;
};

bool parse_header(const uint8_t* data, int64_t n, PcdHeader* h) {
  int64_t pos = 0;
  while (pos < n) {
    int64_t eol = pos;
    while (eol < n && data[eol] != '\n') ++eol;
    std::string line(reinterpret_cast<const char*>(data + pos),
                     size_t(eol - pos));
    pos = eol + 1;
    if (line.empty() || line[0] == '#') continue;

    char key[32];
    if (std::sscanf(line.c_str(), "%31s", key) != 1) continue;
    const char* rest = line.c_str() + std::strlen(key);

    if (!std::strcmp(key, "FIELDS")) {
      char buf[64];
      int consumed = 0;
      const char* p = rest;
      while (std::sscanf(p, "%63s%n", buf, &consumed) == 1) {
        Field f;
        f.name = buf;
        h->fields.push_back(f);
        p += consumed;
      }
    } else if (!std::strcmp(key, "SIZE")) {
      const char* p = rest;
      int consumed = 0;
      for (auto& f : h->fields) {
        if (std::sscanf(p, "%d%n", &f.size, &consumed) != 1) return false;
        p += consumed;
      }
    } else if (!std::strcmp(key, "TYPE")) {
      const char* p = rest;
      int consumed = 0;
      char t;
      for (auto& f : h->fields) {
        if (std::sscanf(p, " %c%n", &t, &consumed) != 1) return false;
        f.type = t;
        p += consumed;
      }
    } else if (!std::strcmp(key, "COUNT")) {
      const char* p = rest;
      int consumed = 0;
      for (auto& f : h->fields) {
        if (std::sscanf(p, "%d%n", &f.count, &consumed) != 1) return false;
        p += consumed;
      }
    } else if (!std::strcmp(key, "POINTS")) {
      std::sscanf(rest, "%ld", &h->points);
    } else if (!std::strcmp(key, "DATA")) {
      char mode[16];
      if (std::sscanf(rest, "%15s", mode) != 1) return false;
      if (!std::strcmp(mode, "ascii")) h->data_mode = 0;
      else if (!std::strcmp(mode, "binary")) h->data_mode = 1;
      else return false;  // binary_compressed unsupported
      h->data_start = pos;
      break;
    }
  }
  if (h->data_mode < 0 || h->fields.empty() || h->points <= 0) return false;
  int off = 0;
  for (auto& f : h->fields) {
    f.offset = off;
    off += f.size * f.count;
  }
  h->point_step = off;
  return true;
}

int find_field(const PcdHeader& h, const char* name) {
  for (size_t i = 0; i < h.fields.size(); ++i) {
    if (h.fields[i].name == name) return int(i);
  }
  return -1;
}

}  // namespace

extern "C" {

int64_t slam3d_pcd_points(const uint8_t* data, int64_t n) {
  PcdHeader h;
  if (!parse_header(data, n, &h)) return -1;
  return h.points;
}

// xyz: float32 (points,3); rgba: uint32 (points,) — pass nullptr to skip.
// Returns number of points read, < 0 on error.
int64_t slam3d_pcd_read(const uint8_t* data, int64_t n, float* xyz,
                        uint32_t* rgba) {
  PcdHeader h;
  if (!parse_header(data, n, &h)) return -1;
  const int fx = find_field(h, "x");
  const int fy = find_field(h, "y");
  const int fz = find_field(h, "z");
  int fc = find_field(h, "rgba");
  if (fc < 0) fc = find_field(h, "rgb");
  if (fx < 0 || fy < 0 || fz < 0) return -2;

  if (h.data_mode == 1) {
    const uint8_t* body = data + h.data_start;
    if (h.data_start + h.points * h.point_step > n) return -3;
    for (int64_t i = 0; i < h.points; ++i) {
      const uint8_t* rec = body + i * h.point_step;
      if (xyz) {
        std::memcpy(xyz + 3 * i + 0, rec + h.fields[fx].offset, 4);
        std::memcpy(xyz + 3 * i + 1, rec + h.fields[fy].offset, 4);
        std::memcpy(xyz + 3 * i + 2, rec + h.fields[fz].offset, 4);
      }
      if (rgba) {
        uint32_t c = 0;
        if (fc >= 0) {
          if (h.fields[fc].type == 'F') {
            float fcol;
            std::memcpy(&fcol, rec + h.fields[fc].offset, 4);
            std::memcpy(&c, &fcol, 4);
          } else {
            std::memcpy(&c, rec + h.fields[fc].offset, 4);
          }
        }
        rgba[i] = c;
      }
    }
    return h.points;
  }

  // ascii
  const char* p = reinterpret_cast<const char*>(data + h.data_start);
  const char* end = reinterpret_cast<const char*>(data + n);
  std::vector<double> vals(h.fields.size());
  for (int64_t i = 0; i < h.points; ++i) {
    for (size_t f = 0; f < h.fields.size(); ++f) {
      char* next = nullptr;
      vals[f] = std::strtod(p, &next);
      if (next == p || next > end) return -4;
      p = next;
    }
    if (xyz) {
      xyz[3 * i + 0] = float(vals[fx]);
      xyz[3 * i + 1] = float(vals[fy]);
      xyz[3 * i + 2] = float(vals[fz]);
    }
    if (rgba) {
      uint32_t c = 0;
      if (fc >= 0) {
        if (h.fields[fc].type == 'F') {
          float fcol = float(vals[fc]);
          std::memcpy(&c, &fcol, 4);
        } else {
          c = uint32_t(vals[fc]);
        }
      }
      rgba[i] = c;
    }
  }
  return h.points;
}

}  // extern "C"
