// Native DCP batch planner: LRU slot allocation + parity bookkeeping for
// both directional passes of one FFC step.
//
// This is the host-side sequential hot path of the framework (the role the
// reference plays out in Python inside its training step, ffc.py:162-245 +
// lru.py — interleaved with device work). Here it runs ahead of the device
// step in the input pipeline; C++ keeps it in the tens-of-microseconds range
// at large batch sizes so the planner never becomes the pipeline bottleneck.
//
// Mirrors vlsfr_tpu/core/lru.py + core/dcp.py exactly (property-tested
// against them from tests/test_native.py):
//   * slots allocated sequentially, eviction reuses the LRU victim's slot
//   * pass A (gallery = y labels) is speculative: op-logged, then undone
//   * pass B (gallery = x labels) persists
//   * per-sample outputs: row (parity), col (slot), seen flag, fake labels
//
// Build: g++ -O3 -shared -fPIC -o libdcp.so dcp_planner.cc   (see build.py)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t kNone = -1;

struct Op {
  enum Kind : uint8_t { kAdd, kPromote, kEvict } kind;
  int64_t slot;
  int64_t old_key;   // kEvict
  int64_t new_key;   // kAdd / kEvict
  int64_t old_prev;  // kPromote / kEvict
  int64_t old_next;  // kPromote / kEvict
};

struct ParityTouch {
  int64_t slot;
  int32_t old_parity;
};

class Planner {
 public:
  explicit Planner(int64_t capacity)
      : cap_(capacity),
        head_(capacity),
        tail_(capacity + 1),
        prev_(capacity + 2, kNone),
        next_(capacity + 2, kNone),
        slot_key_(capacity, kNone),
        parity_(capacity, 0) {
    next_[head_] = tail_;
    prev_[tail_] = head_;
    key2slot_.reserve(static_cast<size_t>(capacity) * 2);
  }

  void PlanStep(const int64_t* x_labels, const int64_t* y_labels, int64_t n,
                int32_t* rows_a, int32_t* cols_a, float* seen_a, int32_t* fake_a,
                int32_t* rows_b, int32_t* cols_b, float* seen_b, int32_t* fake_b) {
    RunPass(y_labels, x_labels, n, /*speculative=*/true, rows_a, cols_a, seen_a, fake_a);
    RunPass(x_labels, y_labels, n, /*speculative=*/false, rows_b, cols_b, seen_b, fake_b);
  }

  int64_t Size() const { return size_; }

  // recency-ordered (most-recent first) export of (key, slot) + parity.
  void Export(int64_t* keys, int64_t* slots, int32_t* parity) const {
    int64_t s = next_[head_];
    int64_t i = 0;
    while (s != tail_) {
      keys[i] = slot_key_[s];
      slots[i] = s;
      ++i;
      s = next_[s];
    }
    std::memcpy(parity, parity_.data(), sizeof(int32_t) * cap_);
  }

  void Restore(const int64_t* keys, const int64_t* slots, int64_t n,
               const int32_t* parity) {
    Clear();
    int64_t prev = head_;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t s = slots[i];
      key2slot_[keys[i]] = s;
      slot_key_[s] = keys[i];
      next_[prev] = s;
      prev_[s] = prev;
      prev = s;
      ++size_;
    }
    next_[prev] = tail_;
    prev_[tail_] = prev;
    std::memcpy(parity_.data(), parity, sizeof(int32_t) * cap_);
  }

  void Clear() {
    key2slot_.clear();
    std::fill(slot_key_.begin(), slot_key_.end(), kNone);
    std::fill(parity_.begin(), parity_.end(), 0);
    size_ = 0;
    next_[head_] = tail_;
    prev_[tail_] = head_;
  }

 private:
  void Unlink(int64_t s) {
    const int64_t p = prev_[s], n = next_[s];
    next_[p] = n;
    prev_[n] = p;
  }

  void PushFront(int64_t s) {
    const int64_t first = next_[head_];
    next_[head_] = s;
    prev_[s] = head_;
    next_[s] = first;
    prev_[first] = s;
  }

  void LinkBetween(int64_t s, int64_t p, int64_t n) {
    next_[p] = s;
    prev_[s] = p;
    next_[s] = n;
    prev_[n] = s;
  }

  // lookup-or-insert, optionally op-logged; returns (slot, was_hit)
  std::pair<int64_t, bool> Get(int64_t key, bool log) {
    auto it = key2slot_.find(key);
    if (it != key2slot_.end()) {
      const int64_t s = it->second;
      if (log) oplog_.push_back({Op::kPromote, s, 0, 0, prev_[s], next_[s]});
      Unlink(s);
      PushFront(s);
      return {s, true};
    }
    if (size_ < cap_) {
      const int64_t s = size_++;
      key2slot_.emplace(key, s);
      slot_key_[s] = key;
      PushFront(s);
      if (log) oplog_.push_back({Op::kAdd, s, 0, key, 0, 0});
      return {s, false};
    }
    const int64_t s = prev_[tail_];
    const int64_t old_key = slot_key_[s];
    if (log) oplog_.push_back({Op::kEvict, s, old_key, key, prev_[s], next_[s]});
    key2slot_.erase(old_key);
    key2slot_.emplace(key, s);
    slot_key_[s] = key;
    Unlink(s);
    PushFront(s);
    return {s, false};
  }

  void RollbackAll() {
    while (!oplog_.empty()) {
      const Op op = oplog_.back();
      oplog_.pop_back();
      switch (op.kind) {
        case Op::kAdd:
          Unlink(op.slot);
          key2slot_.erase(op.new_key);
          slot_key_[op.slot] = kNone;
          --size_;  // LIFO undo restores sequential allocation
          break;
        case Op::kPromote:
          Unlink(op.slot);
          LinkBetween(op.slot, op.old_prev, op.old_next);
          break;
        case Op::kEvict:
          key2slot_.erase(op.new_key);
          key2slot_.emplace(op.old_key, op.slot);
          slot_key_[op.slot] = op.old_key;
          Unlink(op.slot);
          LinkBetween(op.slot, op.old_prev, op.old_next);
          break;
      }
    }
  }

  void RunPass(const int64_t* gallery, const int64_t* probe, int64_t n,
               bool speculative, int32_t* rows, int32_t* cols, float* seen,
               int32_t* fake) {
    touches_.clear();
    if (touched_flag_.size() < static_cast<size_t>(cap_)) touched_flag_.assign(cap_, 0);
    for (int64_t i = 0; i < n; ++i) {
      const auto [slot, hit] = Get(gallery[i], speculative);
      cols[i] = static_cast<int32_t>(slot);
      if (speculative && !touched_flag_[slot]) {
        touched_flag_[slot] = 1;
        touches_.push_back({slot, parity_[slot]});
      }
      if (hit) {
        rows[i] = parity_[slot];
        seen[i] = 1.0f;
        parity_[slot] ^= 1;
      } else {
        rows[i] = 0;
        seen[i] = 0.0f;
        parity_[slot] = 1;
      }
    }
    for (int64_t i = 0; i < n; ++i) {
      auto it = key2slot_.find(probe[i]);
      fake[i] = it == key2slot_.end() ? -1 : static_cast<int32_t>(it->second);
    }
    if (speculative) {
      RollbackAll();
      for (const auto& t : touches_) parity_[t.slot] = t.old_parity;
    }
    for (const auto& t : touches_) touched_flag_[t.slot] = 0;  // O(touched) reset
  }

  const int64_t cap_, head_, tail_;
  std::vector<int64_t> prev_, next_, slot_key_;
  std::vector<int32_t> parity_;
  std::unordered_map<int64_t, int64_t> key2slot_;
  std::vector<Op> oplog_;
  std::vector<ParityTouch> touches_;
  std::vector<uint8_t> touched_flag_;
  int64_t size_ = 0;
};

}  // namespace

extern "C" {

void* dcp_create(int64_t capacity) { return new Planner(capacity); }
void dcp_destroy(void* p) { delete static_cast<Planner*>(p); }

void dcp_plan_step(void* p, const int64_t* x_labels, const int64_t* y_labels,
                   int64_t n, int32_t* rows_a, int32_t* cols_a, float* seen_a,
                   int32_t* fake_a, int32_t* rows_b, int32_t* cols_b,
                   float* seen_b, int32_t* fake_b) {
  static_cast<Planner*>(p)->PlanStep(x_labels, y_labels, n, rows_a, cols_a,
                                     seen_a, fake_a, rows_b, cols_b, seen_b,
                                     fake_b);
}

int64_t dcp_size(void* p) { return static_cast<Planner*>(p)->Size(); }

void dcp_export(void* p, int64_t* keys, int64_t* slots, int32_t* parity) {
  static_cast<Planner*>(p)->Export(keys, slots, parity);
}

void dcp_restore(void* p, const int64_t* keys, const int64_t* slots, int64_t n,
                 const int32_t* parity) {
  static_cast<Planner*>(p)->Restore(keys, slots, n, parity);
}

void dcp_clear(void* p) { static_cast<Planner*>(p)->Clear(); }

}  // extern "C"
