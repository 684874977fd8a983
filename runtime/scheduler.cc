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

// Requeue a slot's request at the queue FRONT with updated lengths and
// free the slot. Used for (a) admission rollback when the page pool cannot
// hold the prompt yet, and (b) preemption-by-recompute when a growing
// sequence runs out of pages mid-decode (the caller passes
// prompt_len = original prompt + tokens generated so far and the remaining
// token budget). FCFS order is preserved by the front push.
void sched_requeue(Scheduler* s, int32_t slot, int32_t prompt_len,
                   int32_t max_new_tokens) {
  Slot& sl = s->slots[slot];
  if (!sl.active) return;
  s->queue.push_front(Request{sl.request_id, prompt_len, max_new_tokens});
  sl = Slot{};
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

// ---------------------------------------------------------------------------
// Page allocator for the paged KV cache (vLLM-style block tables).
// Fixed pool of pages; slots allocate lazily as sequences grow and release
// in O(pages) on completion. Python holds the tensor pages; this tracks
// ownership.
// ---------------------------------------------------------------------------

namespace {

struct PagePool {
  int32_t n_pages;
  std::vector<int32_t> free_list;               // stack of free page ids
  std::vector<std::vector<int32_t>> tables;     // per-slot page tables
};

}  // namespace

extern "C" {

PagePool* pages_create(int32_t n_pages, int32_t n_slots) {
  auto* p = new PagePool();
  p->n_pages = n_pages;
  p->free_list.reserve(n_pages);
  for (int32_t i = n_pages - 1; i >= 0; --i) p->free_list.push_back(i);
  p->tables.resize(n_slots);
  return p;
}

void pages_destroy(PagePool* p) { delete p; }

int32_t pages_free_count(PagePool* p) {
  return static_cast<int32_t>(p->free_list.size());
}

// Allocate one page for a slot. Returns page id or -1 if exhausted.
int32_t pages_alloc(PagePool* p, int32_t slot) {
  if (p->free_list.empty()) return -1;
  int32_t page = p->free_list.back();
  p->free_list.pop_back();
  p->tables[static_cast<size_t>(slot)].push_back(page);
  return page;
}

// Ensure the slot has capacity for `tokens` tokens given page_size; allocates
// as many pages as needed. Returns number of newly allocated pages, or -1 if
// the pool ran out (allocation rolled back).
int32_t pages_ensure(PagePool* p, int32_t slot, int32_t tokens,
                     int32_t page_size) {
  auto& table = p->tables[static_cast<size_t>(slot)];
  int32_t needed = (tokens + page_size - 1) / page_size;
  int32_t added = 0;
  while (static_cast<int32_t>(table.size()) < needed) {
    if (p->free_list.empty()) {
      // rollback
      for (int32_t i = 0; i < added; ++i) {
        p->free_list.push_back(table.back());
        table.pop_back();
      }
      return -1;
    }
    table.push_back(p->free_list.back());
    p->free_list.pop_back();
    ++added;
  }
  return added;
}

// Copy the slot's page table into out (capacity cap); pads with -1.
// Returns the table length.
int32_t pages_table(PagePool* p, int32_t slot, int32_t* out, int32_t cap) {
  const auto& table = p->tables[static_cast<size_t>(slot)];
  int32_t n = static_cast<int32_t>(table.size());
  for (int32_t i = 0; i < cap; ++i) out[i] = i < n ? table[i] : -1;
  return n;
}

// Release every page owned by the slot.
void pages_release(PagePool* p, int32_t slot) {
  auto& table = p->tables[static_cast<size_t>(slot)];
  for (int32_t page : table) p->free_list.push_back(page);
  table.clear();
}

}  // extern "C"
