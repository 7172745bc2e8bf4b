package graft

/**
 * Canonical row types of the engine's public Dataset[T] API.
 *
 * Schemas follow SURVEY.md §1.3. The reference engine
 * (liuhoward/hadoop-tfidf) carries these stages as delimiter-concatenated
 * strings (`word#####file`, `word@file` — DocWordCount.java:62,
 * TFIDF.java:166); we keep real columns so Catalyst can prune/push and no
 * re-parsing (SURVEY.md §2.3) is ever needed.
 *
 * `doc` is a String to cover both identity conventions:
 *  - text-directory corpora: file basename (DocWordCount.java:54)
 *  - parquet corpora: stringified `doc_id`
 */
final case class TokenizedTerm(term: String, doc: String)
final case class DocTermCount(term: String, doc: String, count: Long)
final case class TermFrequency(term: String, doc: String, count: Long, tf: Double)
final case class TfIdfScore(term: String, doc: String, tfidf: Double)
final case class SearchHit(doc: String, score: Double)
final case class RankedHit(doc: String, score: Double)
