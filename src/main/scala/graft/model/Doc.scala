package graft.model

/**
 * One span of an interleaved text+media document (the engine's input
 * row shape, fixed by the corpus contract):
 * `kind` in {text, image, audio, video}; `text` non-empty iff
 * kind == text; `media_ref` non-empty iff kind != text; `offset`
 * strictly increasing within a document — array order == offset order
 * is the per-row invariant that must survive every shuffle.
 */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** An interleaved document: unique sortable id + ordered spans. */
final case class Doc(doc_id: String, spans: Seq[Span])
