"""Sitemap-protocol parsing: urlset vs sitemapindex, optional fields,
multi-line entries."""


def test_parse_urlset_and_index(spark):
    from ontoweaver_spark.webdoc import parse_sitemap

    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <url>\n    <loc> https://a.com/1 </loc>\n"
        "    <lastmod>2026-01-05</lastmod>\n"
        "    <changefreq>daily</changefreq>\n    <priority>0.8</priority>\n"
        "  </url>\n"
        "  <url><loc>https://a.com/2</loc></url>\n"
        "</urlset>"
    )
    index = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>https://a.com/s1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://a.com/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [("https://a.com/sitemap.xml", urlset),
         ("https://a.com/sitemap_index.xml", index)],
        "url string, xml string",
    )
    rows = {
        (r.url, r.kind, r.loc, r.lastmod, r.changefreq, r.priority)
        for r in parse_sitemap(df).collect()
    }
    assert rows == {
        ("https://a.com/sitemap.xml", "urlset", "https://a.com/1",
         "2026-01-05", "daily", "0.8"),
        ("https://a.com/sitemap.xml", "urlset", "https://a.com/2",
         None, None, None),
        ("https://a.com/sitemap_index.xml", "sitemapindex",
         "https://a.com/s1.xml", "2026-02-01", None, None),
        ("https://a.com/sitemap_index.xml", "sitemapindex",
         "https://a.com/s2.xml", None, None, None),
    }


def test_parse_sitemap_empty_and_garbage(spark):
    from ontoweaver_spark.webdoc import parse_sitemap

    df = spark.createDataFrame(
        [("u1", "<urlset></urlset>"), ("u2", "not xml at all")],
        "url string, xml string",
    )
    assert parse_sitemap(df).count() == 0
