// Native evaluation core: greedy COCO matching, box IoU (axis-aligned and
// rotated convex-clip), rotated NMS.
//
// Role: the host-side evaluation hot loops. The reference gets these from
// aitodpycocotools / mmcv C++ (SURVEY.md §2.3); here they back
// point_teacher_tpu.evalx when the shared library is built (ccore/build.sh),
// with numpy fallbacks otherwise. Exposed with a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC eval_core.cpp -o libptteval.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pairwise IoU of xyxy boxes: d[m*4], g[n*4] -> out[m*n]
void iou_xyxy(const float* d, int64_t m, const float* g, int64_t n, float* out) {
  std::vector<float> ga(n);
  for (int64_t j = 0; j < n; ++j) {
    ga[j] = std::max(0.f, g[j * 4 + 2] - g[j * 4 + 0]) *
            std::max(0.f, g[j * 4 + 3] - g[j * 4 + 1]);
  }
  for (int64_t i = 0; i < m; ++i) {
    const float dx1 = d[i * 4], dy1 = d[i * 4 + 1], dx2 = d[i * 4 + 2],
                dy2 = d[i * 4 + 3];
    const float da = std::max(0.f, dx2 - dx1) * std::max(0.f, dy2 - dy1);
    for (int64_t j = 0; j < n; ++j) {
      const float x1 = std::max(dx1, g[j * 4]);
      const float y1 = std::max(dy1, g[j * 4 + 1]);
      const float x2 = std::min(dx2, g[j * 4 + 2]);
      const float y2 = std::min(dy2, g[j * 4 + 3]);
      const float inter =
          std::max(0.f, x2 - x1) * std::max(0.f, y2 - y1);
      const float uni = da + ga[j] - inter;
      out[i * n + j] = uni > 1e-12f ? inter / uni : 0.f;
    }
  }
}

// Greedy COCO matching (canonical COCOeval order): detections are already
// score-descending; gts visited regular-first. Writes per-det matched IoU
// (-1 unmatched) and matched-to-ignored flags.
void match_greedy(const float* iou, int64_t m, int64_t n,
                  const uint8_t* gt_ignore, float thr, float* dt_iou,
                  uint8_t* dt_ig) {
  std::vector<uint8_t> taken(n, 0);
  std::vector<int64_t> order(n);
  int64_t k = 0;
  for (int64_t j = 0; j < n; ++j)
    if (!gt_ignore[j]) order[k++] = j;
  for (int64_t j = 0; j < n; ++j)
    if (gt_ignore[j]) order[k++] = j;

  for (int64_t i = 0; i < m; ++i) {
    int64_t best = -1;
    float best_iou = thr;
    bool matched_ignore = false;
    for (int64_t oj = 0; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (taken[j]) continue;
      if (best > -1 && !matched_ignore && gt_ignore[j]) break;
      const float v = iou[i * n + j];
      if (v >= best_iou) {
        best = j;
        best_iou = v;
        matched_ignore = gt_ignore[j] != 0;
      }
    }
    if (best > -1) {
      taken[best] = 1;
      dt_iou[i] = best_iou;
      dt_ig[i] = matched_ignore ? 1 : 0;
    } else {
      dt_iou[i] = -1.f;
      dt_ig[i] = 0;
    }
  }
}

namespace {

struct Pt {
  double x, y;
};

double poly_area(const Pt* p, int n) {
  double a = 0;
  for (int i = 0; i < n; ++i) {
    const int j = (i + 1) % n;
    a += p[i].x * p[j].y - p[j].x * p[i].y;
  }
  return std::fabs(a) * 0.5;
}

void obb_corners(const float* rb, Pt* out) {
  const double cx = rb[0], cy = rb[1], w = rb[2] * 0.5, h = rb[3] * 0.5;
  const double c = std::cos((double)rb[4]), s = std::sin((double)rb[4]);
  const double dx[4] = {-w, w, w, -w};
  const double dy[4] = {-h, -h, h, h};
  for (int i = 0; i < 4; ++i) {
    out[i].x = c * dx[i] - s * dy[i] + cx;
    out[i].y = s * dx[i] + c * dy[i] + cy;
  }
}

// Sutherland–Hodgman clip of polygon p (np verts) against ccw clipper q (4).
int clip_poly(Pt* p, int np, const Pt* q) {
  static thread_local Pt buf[32];
  for (int e = 0; e < 4; ++e) {
    const Pt a = q[e], b = q[(e + 1) % 4];
    const double ex = b.x - a.x, ey = b.y - a.y;
    int no = 0;
    for (int i = 0; i < np; ++i) {
      const Pt cur = p[i], nxt = p[(i + 1) % np];
      const double sc = ex * (cur.y - a.y) - ey * (cur.x - a.x);
      const double sn = ex * (nxt.y - a.y) - ey * (nxt.x - a.x);
      if (sc >= 0) buf[no++] = cur;
      if ((sc >= 0) != (sn >= 0)) {
        const double t = sc / (sc - sn);
        buf[no].x = cur.x + t * (nxt.x - cur.x);
        buf[no].y = cur.y + t * (nxt.y - cur.y);
        ++no;
      }
    }
    np = no;
    std::memcpy(p, buf, sizeof(Pt) * no);
    if (np == 0) return 0;
  }
  return np;
}

double rbox_pair_iou(const float* a, const float* b) {
  Pt pa[32], pb[4];
  obb_corners(a, pa);
  obb_corners(b, pb);
  // quick reject via aabb covers
  double ax1 = 1e30, ay1 = 1e30, ax2 = -1e30, ay2 = -1e30;
  double bx1 = 1e30, by1 = 1e30, bx2 = -1e30, by2 = -1e30;
  for (int i = 0; i < 4; ++i) {
    ax1 = std::min(ax1, pa[i].x); ay1 = std::min(ay1, pa[i].y);
    ax2 = std::max(ax2, pa[i].x); ay2 = std::max(ay2, pa[i].y);
    bx1 = std::min(bx1, pb[i].x); by1 = std::min(by1, pb[i].y);
    bx2 = std::max(bx2, pb[i].x); by2 = std::max(by2, pb[i].y);
  }
  if (ax2 < bx1 || bx2 < ax1 || ay2 < by1 || by2 < ay1) return 0.0;
  // orient clipper ccw
  const double cr = (pb[1].x - pb[0].x) * (pb[2].y - pb[1].y) -
                    (pb[1].y - pb[0].y) * (pb[2].x - pb[1].x);
  Pt q[4];
  if (cr < 0) {
    for (int i = 0; i < 4; ++i) q[i] = pb[3 - i];
  } else {
    std::memcpy(q, pb, sizeof(q));
  }
  const int nv = clip_poly(pa, 4, q);
  const double inter = nv ? poly_area(pa, nv) : 0.0;
  const double uni = (double)a[2] * a[3] + (double)b[2] * b[3] - inter;
  return uni > 0 ? inter / uni : 0.0;
}

}  // namespace

// Pairwise rotated IoU: d[m*5], g[n*5] -> out[m*n]
void rbox_iou(const float* d, int64_t m, const float* g, int64_t n,
              float* out) {
  for (int64_t i = 0; i < m; ++i)
    for (int64_t j = 0; j < n; ++j)
      out[i * n + j] = (float)rbox_pair_iou(d + i * 5, g + j * 5);
}

// Greedy rotated NMS. boxes[n*5], scores[n]; writes keep flags [n].
void nms_rotated(const float* boxes, const float* scores, int64_t n,
                 float iou_thr, uint8_t* keep) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return scores[a] > scores[b]; });
  std::vector<uint8_t> sup(n, 0);
  std::memset(keep, 0, n);
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (sup[i]) continue;
    keep[i] = 1;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (sup[j]) continue;
      if (rbox_pair_iou(boxes + i * 5, boxes + j * 5) > iou_thr) sup[j] = 1;
    }
  }
}

}  // extern "C"
