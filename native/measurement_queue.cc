// Native measurement runtime: thread-safe IMU/feature-frame queues with
// time alignment — the C++ equivalent of the reference's estimator_node
// buffers (vins_estimator/src/estimator_node.cpp: imu_buf/feature_buf,
// m_buf + condition variable, getMeasurements :98-136, out-of-order IMU
// rejection :138-146, frame dropping when the IMU stream hasn't caught up).
//
// Alignment contract (kept bit-identical to the Python fallback
// vins_tpu/io/euroc.py::iter_measurements so the two can be
// differential-tested): for each feature frame at t_img, emit every buffered
// IMU sample with t <= t_img + td; when the last such sample is strictly
// before t_img + td, append a row linearly interpolated at exactly
// t_img + td (the straddling-sample split, estimator_node.cpp:246-264).
// The final emitted row is retained as the opening boundary of the next
// interval; a frame older than the whole IMU buffer is dropped.
//
// Build: make -C native  (-> libvinsio.so, shared with the PNG decoder).
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>

namespace {

struct ImuSample {
  double t;
  double acc[3];
  double gyr[3];
};

struct FeatFrame {
  double t;
  int64_t payload;
};

struct Queue {
  std::mutex m;
  std::condition_variable cv;
  std::deque<ImuSample> imu;
  std::deque<FeatFrame> feat;
  double last_imu_t = -1e300;
  long imu_cap;
  long feat_cap;
  bool closed = false;
  bool first = true;
  long dropped_frames = 0;
  long rejected_imu = 0;
};

}  // namespace

extern "C" {

void* vmq_create(long imu_cap, long feat_cap) {
  Queue* q = new Queue();
  q->imu_cap = imu_cap > 0 ? imu_cap : (1L << 20);
  q->feat_cap = feat_cap > 0 ? feat_cap : (1L << 16);
  return q;
}

void vmq_destroy(void* h) { delete static_cast<Queue*>(h); }

// 0 = accepted; -1 = out-of-order (rejected, estimator_node.cpp:140-145);
// -2 = capacity (caller should drain first).
int vmq_push_imu(void* h, double t, const double* acc, const double* gyr) {
  Queue* q = static_cast<Queue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  if (t <= q->last_imu_t) {
    q->rejected_imu++;
    return -1;
  }
  if ((long)q->imu.size() >= q->imu_cap) return -2;
  q->last_imu_t = t;
  ImuSample s;
  s.t = t;
  std::memcpy(s.acc, acc, 3 * sizeof(double));
  std::memcpy(s.gyr, gyr, 3 * sizeof(double));
  q->imu.push_back(s);
  q->cv.notify_all();
  return 0;
}

int vmq_push_feature(void* h, double t, int64_t payload) {
  Queue* q = static_cast<Queue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  if ((long)q->feat.size() >= q->feat_cap) return -2;
  q->feat.push_back({t, payload});
  q->cv.notify_all();
  return 0;
}

void vmq_close(void* h) {
  Queue* q = static_cast<Queue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  q->closed = true;
  q->cv.notify_all();
}

// Clear all state (the restart path, estimator_node.cpp:179-198).
void vmq_restart(void* h) {
  Queue* q = static_cast<Queue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  q->imu.clear();
  q->feat.clear();
  q->last_imu_t = -1e300;
  q->first = true;
  q->closed = false;
  q->cv.notify_all();
}

void vmq_stats(void* h, long* dropped_frames, long* rejected_imu,
               long* imu_len, long* feat_len) {
  Queue* q = static_cast<Queue*>(h);
  std::lock_guard<std::mutex> lk(q->m);
  if (dropped_frames) *dropped_frames = q->dropped_frames;
  if (rejected_imu) *rejected_imu = q->rejected_imu;
  if (imu_len) *imu_len = (long)q->imu.size();
  if (feat_len) *feat_len = (long)q->feat.size();
}

// Pop the next aligned measurement.  imu_out rows are
// [t, ax, ay, az, gx, gy, gz] (max_n rows available).
// Returns: n > 0   = number of IMU rows written, frame info in *t_img /
//                    *payload;
//          0       = stream closed and nothing more can be produced;
//          -1      = would block (only when blocking == 0);
//          -(2+k)  = caller buffer too small, needs k rows.
long vmq_next(void* h, double td, double* imu_out, long max_n, double* t_img,
              int64_t* payload, int blocking) {
  Queue* q = static_cast<Queue*>(h);
  std::unique_lock<std::mutex> lk(q->m);
  for (;;) {
    if (!q->feat.empty() && !q->imu.empty()) {
      const FeatFrame f = q->feat.front();
      const double t_end = f.t + td;
      if (q->imu.front().t > t_end) {
        // whole buffer is newer than the frame
        if (q->first) {
          // pre-IMU frames are silently skipped (iter_measurements "first")
          q->feat.pop_front();
          continue;
        }
        // mid-stream this cannot happen (we retain a boundary sample ≤ the
        // previous t_end < this t_end), but guard anyway: drop the frame
        // like the reference throws stale images (estimator_node.cpp:118)
        q->dropped_frames++;
        q->feat.pop_front();
        continue;
      }
      if (q->imu.back().t > t_end) {
        // interval complete: emit samples with t <= t_end
        long n = 0;
        while (n < (long)q->imu.size() && q->imu[n].t <= t_end) n++;
        const bool interp = q->imu[n - 1].t < t_end;
        const long n_out = n + (interp ? 1 : 0);
        if (n_out > max_n) return -(2 + n_out);
        for (long k = 0; k < n; k++) {
          const ImuSample& s = q->imu[k];
          double* row = imu_out + 7 * k;
          row[0] = s.t;
          std::memcpy(row + 1, s.acc, 3 * sizeof(double));
          std::memcpy(row + 4, s.gyr, 3 * sizeof(double));
        }
        if (interp) {
          // split the straddling sample: linear interpolation at exactly
          // t_end (estimator_node.cpp:246-264)
          const ImuSample& s0 = q->imu[n - 1];
          const ImuSample& s1 = q->imu[n];
          const double w = (t_end - s0.t) / (s1.t - s0.t);
          ImuSample si;
          si.t = t_end;
          for (int j = 0; j < 3; j++) {
            si.acc[j] = s0.acc[j] + w * (s1.acc[j] - s0.acc[j]);
            si.gyr[j] = s0.gyr[j] + w * (s1.gyr[j] - s0.gyr[j]);
          }
          double* row = imu_out + 7 * n;
          row[0] = si.t;
          std::memcpy(row + 1, si.acc, 3 * sizeof(double));
          std::memcpy(row + 4, si.gyr, 3 * sizeof(double));
          // boundary = the interpolated sample at t_end
          for (long k = 0; k < n; k++) q->imu.pop_front();
          q->imu.push_front(si);
        } else {
          // retain the last emitted sample as the next interval's boundary
          for (long k = 0; k + 1 < n; k++) q->imu.pop_front();
        }
        *t_img = f.t;
        *payload = f.payload;
        q->feat.pop_front();
        q->first = false;
        q->cv.notify_all();
        return n_out;
      }
      // else: need more IMU past t_end — fall through to wait
    }
    if (q->closed) {
      // drain check: anything still producible?  (a closed stream can never
      // complete an interval that needs future IMU)
      return 0;
    }
    if (!blocking) return -1;
    q->cv.wait(lk);
  }
}

}  // extern "C"
