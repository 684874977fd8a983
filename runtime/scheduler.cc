// Continuous-batching scheduler core (C API, consumed via ctypes).
//
// Native runtime component of the inference engine: request queue, slot
// allocation, and decode-batch composition are managed here so the Python
// side only moves tensors. North-star addition — the reference has no
// serving path at all (SURVEY §0); its only "runtime" was Lightning's
// training loop.
//
// Model: a fixed number of slots (the decode batch lanes). Requests are
// FCFS-admitted into free slots; each step() the engine asks which slots to
// prefill (newly admitted) and which to decode; finished slots are
// released. All bookkeeping is O(slots) per call, lock-free single-threaded
// (the engine loop owns it) with a small FIFO queue.

#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

namespace {

struct Request {
  int64_t id;
  int32_t prompt_len;
  int32_t max_new_tokens;
};

struct Slot {
  bool active = false;
  bool needs_prefill = false;
  int64_t request_id = -1;
  int32_t prompt_len = 0;
  int32_t generated = 0;
  int32_t max_new_tokens = 0;
};

struct Scheduler {
  int32_t n_slots;
  int32_t max_len;
  std::deque<Request> queue;
  std::vector<Slot> slots;
  int64_t next_id = 1;
};

}  // namespace

extern "C" {

Scheduler* sched_create(int32_t n_slots, int32_t max_len) {
  auto* s = new Scheduler();
  s->n_slots = n_slots;
  s->max_len = max_len;
  s->slots.resize(n_slots);
  return s;
}

void sched_destroy(Scheduler* s) { delete s; }

// Enqueue a request; returns its id (or -1 if it can never fit).
int64_t sched_submit(Scheduler* s, int32_t prompt_len,
                     int32_t max_new_tokens) {
  if (prompt_len + max_new_tokens > s->max_len || prompt_len <= 0) {
    return -1;
  }
  int64_t id = s->next_id++;
  s->queue.push_back(Request{id, prompt_len, max_new_tokens});
  return id;
}

// Admit queued requests into free slots. Returns number admitted and fills
// out_slots/out_ids (arrays of size >= n_slots).
int32_t sched_admit(Scheduler* s, int32_t* out_slots, int64_t* out_ids) {
  int32_t admitted = 0;
  for (int32_t i = 0; i < s->n_slots && !s->queue.empty(); ++i) {
    Slot& slot = s->slots[i];
    if (slot.active) continue;
    Request r = s->queue.front();
    s->queue.pop_front();
    slot.active = true;
    slot.needs_prefill = true;
    slot.request_id = r.id;
    slot.prompt_len = r.prompt_len;
    slot.generated = 0;
    slot.max_new_tokens = r.max_new_tokens;
    out_slots[admitted] = i;
    out_ids[admitted] = r.id;
    ++admitted;
  }
  return admitted;
}

// Mark a slot's prefill as done (it joins the decode batch).
void sched_prefill_done(Scheduler* s, int32_t slot) {
  s->slots[slot].needs_prefill = false;
}

// Which slots participate in the next decode step. Fills out_mask
// (n_slots int8: 1 = decode). Returns count.
int32_t sched_decode_mask(Scheduler* s, int8_t* out_mask) {
  int32_t n = 0;
  for (int32_t i = 0; i < s->n_slots; ++i) {
    const Slot& slot = s->slots[i];
    bool run = slot.active && !slot.needs_prefill;
    out_mask[i] = run ? 1 : 0;
    n += run ? 1 : 0;
  }
  return n;
}

// Record one decoded token for a slot; eos=1 if the token ended the
// sequence. Returns 1 if the request is now finished (slot released).
int32_t sched_token_decoded(Scheduler* s, int32_t slot, int8_t eos) {
  Slot& sl = s->slots[slot];
  if (!sl.active) return 0;
  sl.generated += 1;
  bool done = eos != 0 || sl.generated >= sl.max_new_tokens ||
              sl.prompt_len + sl.generated >= s->max_len;
  if (done) {
    sl = Slot{};
    return 1;
  }
  return 0;
}

int32_t sched_num_active(Scheduler* s) {
  int32_t n = 0;
  for (const auto& sl : s->slots) n += sl.active ? 1 : 0;
  return n;
}

int32_t sched_queue_depth(Scheduler* s) {
  return static_cast<int32_t>(s->queue.size());
}

int64_t sched_slot_request(Scheduler* s, int32_t slot) {
  return s->slots[slot].active ? s->slots[slot].request_id : -1;
}

}  // extern "C"
