package graft.eventstore

import java.sql.Timestamp

/** Caused-by link (reference doc/schemas.md:19-43 `provenance`). */
final case class Provenance(
    service_id: String,
    local_id: String,
    relationship: String)

/** The event-log row (SURVEY.md §1.6 mapping of the reference's event map,
  * doc/index.adoc:99-108):
  *
  *  - `stream_name`  — the logical stream; `__all__` is simply "no filter"
  *  - `order_id`     — globally unique monotone replay cursor
  *                     (reference streams.clj:288-301)
  *  - `event_time`   — server ingest wall-clock (streams.clj:296-297)
  *  - `service_id` / `local_id` / `schema_version` — client-supplied
  *    required ingest fields (api.clj:35-36, doc/schemas.md:19-43)
  *  - `payload`      — schema-less JSON text; hot fields are promoted on
  *    read with from_json/get_json_object (keeps ingest schema-free)
  */
final case class Event(
    stream_name: String,
    order_id: Long,
    event_time: Timestamp,
    service_id: String,
    local_id: String,
    schema_version: String,
    payload: String,
    provenance: Option[Provenance] = None)
