package graft

/** The reference's own test fixtures re-encoded as golden expectations, per
  * the north rule ("its DOM-traversal, attribute-rewrite, and text-extraction
  * unit tests re-encoded as golden expectations checked by sbt -batch test").
  * Sources: /root/reference/tests/test.rs:12-291 and
  * /root/reference/tests/test_edge_cases.rs:5-45.
  */
object Fixtures {

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Byte-exact copies of the reference's html_source()/html_result()
    * (tests/test.rs:12-116) — kept as resources because the expected output
    * contains lines with trailing whitespace left by deleted elements. */
  val htmlSource: String = resource("g1_source.html")
  val htmlResult: String = resource("g1_expected.html")

  val expectedDataJson: String =
    """{"top_link":{"url":"https://top.link","name":"New Top Link"},"to_delete":[{"contents":"First item to be deleted"},{"contents":"Second item to be deleted"},{"contents":"Third item to be deleted"}],"formdata":{"text_key":"text_val","radio_key":"radio_val_checked","checkbox_key":["1","3"],"select_key":"select_val2"},"coll1":[{"href":"coll1_link1","name":"Coll1 Title1"},{"href":"coll1_link2","name":"Coll1 Title2"}],"coll2":[{"href":"coll2_link1","name":"Coll2 Title1"},{"href":"coll2_link2","name":"Coll2 Title2"}]}"""

  val shadowJson1: String =
    """
    {
        "s": "head",
        "sub": [
            {
                "s": "title",
                "edit": {
                    "content": {
                        "op": "upsert",
                        "val": "New Title"
                    }
                }
            },
            {
                "s": "meta",
                "edit": {
                    "attrs": {
                        "content": {
                            "op": "match_replace",
                            "match": "^(.*) content$",
                            "val": "just $1"
                        }
                    }
                }
            }
        ]
    }
    """

  val shadowJson2: String =
    """
    {
        "s": "body",
        "sub": [
            {
                "s": "div[name=\"match_test\"]",
                "edit": {
                    "content": {
                        "op": "match_replace",
                        "match": "(\\S+) (\\S+)",
                        "val": "$2 $1"
                    }
                }
            },
            {
                "s": "div[name=\"match_empty\"]",
                "edit": {
                    "content": {
                        "op": "upsert",
                        "val": "Not empty anymore"
                    }
                }
            },
            {
                "s": "a.top_link",
                "edit": {
                    "attrs": {
                        "style": {
                            "op": "delete"
                        },
                        "id": {
                            "op": "upsert",
                            "val": "123"
                        }
                    },
                    "content": {
                        "op": "upsert",
                        "val": "New Top Link"
                    }
                },
                "data": {
                    "path": "top_link",
                    "values": {
                        "url": {"source": "Attribute", "name":"href"},
                        "name": {"source": "Contents"}
                    }
                },
                "hide": true
            },
            {
                "s": "#first form",
                "data": {
                    "path": "formdata"
                },
                "sub": [
                    {
                        "s": "input[name=\"text_key\"]",
                        "data": {
                            "values": {
                                "text_key": {"source": "Value"}
                            }
                        }
                    },
                    {
                        "s": "input[name=\"radio_key\"][checked]",
                        "data": {
                            "values": {
                                "radio_key": {"source": "Value"}
                            }
                        }
                    },
                    {
                        "s": "input[name=\"checkbox_key\"][checked]",
                        "data": {
                            "values": {
                                "checkbox_key": {"source": "Value"}
                            }
                        }
                    },
                    {
                        "s": "select[name=\"select_key\"] > option[selected=\"selected\"]",
                        "data": {
                            "values": {
                                "select_key": {"source": "Value"}
                            }
                        }
                    }
                ]
            },
            {
                "s": "#second > #el_anchor",
                "append": ["<div>Append</div>"],
                "prepend": ["<div>Prepend</div>"],
                "insert_before": ["<div>Insert Before</div>"],
                "insert_after": ["<div>Insert After</div>"]
            },
            {
                "s": ".to_delete",
                "data": {
                    "path": "to_delete.",
                    "values": {
                        "contents": {"source": "Contents"}
                    }
                },
                "delete": true
            },
            {
                "s": ".coll1",
                "data": {
                    "path": "coll1."
                },
                "sub": [
                    {
                        "s": "a",
                        "data": {
                            "values": {
                                "href": {"source": "Attribute", "name": "href"},
                                "name": {"source": "Contents"}
                            }
                        }
                    }
                ]
            },
            {
                "s": ".coll2",
                "sub": [
                    {
                        "s": "a",
                        "data": {
                            "path": "coll2.",
                            "values": {
                                "href": {"source": "Attribute", "name": "href"},
                                "name": {"source": "Contents"}
                            }
                        }
                    }
                ]
            }
        ]
    }
    """

  // test_edge_cases.rs:8
  val h3Source: String =
    """<h3 class="_16u2l0ua" style="overflow-wrap:anywhere;word-break:keep-all">世界を<wbr>リードする<wbr>デジタルイノベーターの<wbr>信頼を<wbr>得ています</h3>"""
  val h3Expected: String =
    """<h3 class="_16u2l0ua" style="overflow-wrap:anywhere;word-break:keep-all">replaced</h3>"""
  val h3Rules: String =
    """{
        "s": "h3._16u2l0ua",
        "edit": {
            "content": {
                "op": "upsert",
                "val": "replaced"
            }
        }
    }"""

  // test.rs:398-439
  val emptyTitleSource = "<html><head><title></title></head><body></body></html>"
  val emptyTitleExpected = "<html><head><title>Not empty anymore</title></head><body></body></html>"
  val emptyTitleRules: String =
    """{
        "s": "title",
        "edit": {
            "content": {
                "op": "upsert",
                "val": "Not empty anymore"
            }
        }
    }"""
}
