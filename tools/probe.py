import duckdb
con = duckdb.connect()
d='/root/testdata/sf0.01'
print('-- top token-jaccard pairs (same lang):')
print(con.sql(f"""
WITH t AS (SELECT doc_id, lang, list_distinct(string_split_regex(lower(text), ' +')) toks FROM '{d}/documents.parquet')
SELECT a.doc_id a_id, b.doc_id b_id, round(len(list_intersect(a.toks,b.toks))::DOUBLE / (len(a.toks)+len(b.toks)-len(list_intersect(a.toks,b.toks))),4) jac
FROM t a JOIN t b ON a.lang=b.lang AND a.doc_id < b.doc_id ORDER BY jac DESC LIMIT 8"""))
print('-- embedding cosine top pairs:')
print(con.sql(f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM '{d}/embeddings.parquet')
SELECT a.vec_id a_id, b.vec_id b_id, round(list_inner_product(a.v,b.v)/(sqrt(list_inner_product(a.v,a.v))*sqrt(list_inner_product(b.v,b.v))),4) cos
FROM e a JOIN e b ON a.vec_id < b.vec_id ORDER BY cos DESC LIMIT 8"""))
print(con.sql(f"select count(*) n_emb from '{d}/embeddings.parquet'"))
print(con.sql(f"select min(len(string_split_regex(lower(text), ' +'))) mn, max(len(string_split_regex(lower(text), ' +'))) mx from '{d}/documents.parquet'"))
